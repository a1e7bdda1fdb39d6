"""CLI integration test: `run.py --train --synthetic` end-to-end in a
subprocess on the tiny config (the reference's local smoke run, SURVEY §4)."""

import os
import subprocess
import sys
import pytest

pytestmark = pytest.mark.slow  # multi-minute integration tier (VERDICT r2 weak 5)

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def test_train_cli_smoke(tmp_path):
    env = dict(os.environ)
    env["WINDSR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    # isolate run artifacts + data cache in tmp
    cfg_src = open(os.path.join(REPO, "configs", "tiny.ini")).read()
    cfg_src = cfg_src.replace("root_path = ./runs_root",
                              f"root_path = {tmp_path}/runs_root")
    cfg_src = cfg_src.replace("data_root = ./data",
                              f"data_root = {tmp_path}/data")
    cfg_path = tmp_path / "tiny.ini"
    cfg_path.write_text(cfg_src)

    proc = subprocess.run(
        [sys.executable, "run.py", "--train", "--synthetic",
         "--cfg", str(cfg_path), "--loglevel", "info"],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]

    runs = os.path.join(str(tmp_path), "runs_root", "runs")
    run_dirs = os.listdir(runs)
    assert len(run_dirs) == 1
    run_dir = os.path.join(runs, run_dirs[0])
    # resolved config snapshot + checkpoint + val images present
    assert os.path.exists(os.path.join(run_dir, "config.ini"))
    ckpts = [n for n in os.listdir(run_dir) if n.startswith("ckpt_")]
    assert ckpts
    assert any(
        n.startswith("val_imgs__it_")
        for n in os.listdir(os.path.join(run_dir, "images"))
    )

    # ---- chain: evaluate the trained checkpoint through the --test CLI
    cfg_test = cfg_src.replace(
        f"data_root = {tmp_path}/data",
        f"data_root = {tmp_path}/data\n"
        f"generator_load_path = {os.path.join(run_dir, ckpts[0])}",
        1,
    )
    cfg_test_path = tmp_path / "tiny_test.ini"
    cfg_test_path.write_text(cfg_test)
    env["PYTHONPATH"] = REPO + os.pathsep + env.get("PYTHONPATH", "")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"), "--test",
         "--synthetic", "--cfg", str(cfg_test_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    out_csv = os.path.join(str(tmp_path), "test_output",
                           "tiny_smoke____metrics.csv")
    assert os.path.exists(out_csv)
    assert os.path.exists(
        os.path.join(str(tmp_path), "test_output", "averages.csv")
    )

    # ---- chain: offline 2D publication figures from the test field dump
    test_runs = sorted(os.listdir(runs))
    fields_dir = os.path.join(runs, test_runs[-1], "fields")
    pkls = [n for n in os.listdir(fields_dir)
            if n.startswith("test_fields_")]
    assert pkls
    proc = subprocess.run(
        [sys.executable, "-m", "gan_sr_wind_field_tpu.viz.plots",
         os.path.join(fields_dir, pkls[0]), "--z", "0", "--components",
         "u", "--out", str(tmp_path / "figs")],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=300,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(str(tmp_path / "figs" / "u_0_scale4.png"))

    # ---- chain: SR-only inference dumps through the --use CLI
    # (reference test.py:106-121 path)
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"), "--use",
         "--synthetic", "--cfg", str(cfg_test_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    use_runs = sorted(os.listdir(runs))
    use_fields = os.path.join(runs, use_runs[-1], "fields")
    use_pkls = [n for n in os.listdir(use_fields)
                if n.startswith("test_fields_")]
    assert use_pkls
    import pickle

    with open(os.path.join(use_fields, use_pkls[0]), "rb") as f:
        dump = pickle.load(f)
    assert set(dump) == {"LR", "SR"}  # SR-only schema
    assert dump["SR"].shape[0] == 3

    # ---- chain: deployment artifact through the --export CLI, then load
    # it with zero model/config infrastructure (eval/export.py)
    artifact = str(tmp_path / "generator.wsrx")
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "run.py"),
         "--export", artifact, "--synthetic", "--cfg", str(cfg_test_path)],
        cwd=str(tmp_path), env=env, capture_output=True, text=True,
        timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    assert os.path.exists(artifact)

    import numpy as np

    from gan_sr_wind_field_tpu.eval.export import load_exported

    sr = load_exported(artifact)
    assert sr.norm_stats is not None and sr.norm_stats["uvw_max"] > 0
    b, X, Y, zl, cin = [d if d != "b" else 2 for d in sr.header["lr_shape"]]
    s = sr.header["scale"]
    rng = np.random.default_rng(0)
    out = sr.upscale(
        rng.standard_normal((b, X, Y, zl, cin)).astype(np.float32) * 0.1,
        rng.standard_normal((b, X * s, Y * s, zl, 1)).astype(np.float32),
    )
    assert out.shape == (b, X * s, Y * s, zl, 3)
    assert np.all(np.isfinite(out))

    # ---- chain: HTTP daemon through the --serve CLI (eval/server.py)
    import io
    import json
    import socket
    import time
    import urllib.error
    import urllib.request

    sock = socket.socket()
    sock.bind(("127.0.0.1", 0))
    port = sock.getsockname()[1]
    sock.close()
    daemon = subprocess.Popen(
        [sys.executable, os.path.join(REPO, "run.py"), "--serve",
         str(port), "--serve_warmup", "1", "--synthetic", "--cfg",
         str(cfg_test_path)],
        cwd=str(tmp_path), env=env, stdout=subprocess.PIPE,
        stderr=subprocess.STDOUT, text=True,
    )
    try:
        health = None
        deadline = time.time() + 300
        while time.time() < deadline:
            if daemon.poll() is not None:
                raise AssertionError(
                    f"--serve exited early:\n{daemon.stdout.read()[-3000:]}"
                )
            try:
                with urllib.request.urlopen(
                    f"http://127.0.0.1:{port}/v1/health", timeout=5
                ) as r:
                    health = json.loads(r.read())
                break
            except (urllib.error.URLError, ConnectionError, OSError):
                time.sleep(1.0)
        assert health is not None and health["status"] == "ok", health
        assert health["norm_stats"]["uvw_max"] > 0  # physical-unit factors
        buf = io.BytesIO()
        np.savez(
            buf,
            lr=rng.standard_normal((X, Y, zl, cin)).astype(np.float32) * 0.1,
            z=rng.standard_normal((X * s, Y * s, zl, 1)).astype(np.float32),
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/upscale", data=buf.getvalue(),
            method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            served = np.load(io.BytesIO(r.read()))["sr"]
        assert served.shape == (X * s, Y * s, zl, 3)
        assert np.all(np.isfinite(served))
        # ---- /v1/upscale_tiled: run.py wires tile = training LR extent;
        # an arbitrary non-tile-divisible extent must come back covered
        assert health["tile"] == X
        buf = io.BytesIO()
        np.savez(
            buf,
            lr=rng.standard_normal((X + 3, Y + 2, zl, cin))
            .astype(np.float32) * 0.1,
            z=rng.standard_normal(((X + 3) * s, (Y + 2) * s, zl, 1))
            .astype(np.float32),
        )
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/v1/upscale_tiled",
            data=buf.getvalue(), method="POST",
        )
        with urllib.request.urlopen(req, timeout=300) as r:
            tiled = np.load(io.BytesIO(r.read()))["sr"]
        assert tiled.shape == ((X + 3) * s, (Y + 2) * s, zl, 3)
        assert np.all(np.isfinite(tiled))
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/v1/stats", timeout=30
        ) as r:
            stats = json.loads(r.read())
        assert stats["requests"] >= 1
        assert stats["request_latency"]["count"] >= 1
        assert stats["request_latency"]["p50_ms"] > 0.0
    finally:
        daemon.terminate()  # SIGTERM -> graceful shutdown path
        rc = daemon.wait(timeout=60)
    assert rc == 0, f"--serve did not shut down cleanly (rc {rc})"
    log_tail = daemon.stdout.read()[-3000:]
    assert "warmup: batch 1" in log_tail


def test_download_cli_dispatch(tmp_path, monkeypatch):
    """run.py --download end-to-end in-process over a pre-seeded raw .nc
    (reference run.py --download ≙ download_data path); network calls are
    stubbed to fail like the zero-egress pods."""
    import re
    from datetime import date

    import run as run_mod
    from gan_sr_wind_field_tpu.data import downloader, files as dfiles
    from test_downloader_integration import NZ, _write_fake_nc

    raw_dir = tmp_path / "data" / "downloaded_raw_bessaker_data"
    raw_dir.mkdir(parents=True)
    day = date(2018, 3, 7)
    _write_fake_nc(str(raw_dir / downloader.raw_filename(day, "T00Z.nc")))

    import urllib.request

    monkeypatch.setattr(
        urllib.request, "urlretrieve",
        lambda url, local: (_ for _ in ()).throw(OSError("no egress")),
    )

    cfg_src = open(os.path.join(REPO, "configs", "tiny.ini")).read()
    cfg_src = cfg_src.replace("root_path = ./runs_root",
                              f"root_path = {tmp_path}/runs_root")
    cfg_src = cfg_src.replace("data_root = ./data",
                              f"data_root = {tmp_path}/data")
    cfg_src = cfg_src.replace("number_of_z_layers = 4",
                              f"number_of_z_layers = {NZ}")
    cfg_src = re.sub(r"start_date = .*", "start_date = [2018, 3, 7]",
                     cfg_src)
    cfg_src = re.sub(r"end_date = .*", "end_date = [2018, 3, 7]", cfg_src)
    cfg_path = tmp_path / "dl.ini"
    cfg_path.write_text(cfg_src)

    run_mod.main(["--download", "--cfg", str(cfg_path)])

    folder = dfiles.dataset_folder(str(tmp_path / "data"), f"bessaker_z{NZ}")
    cached = [n for n in os.listdir(folder) if n.endswith(".pkl")]
    # 12 hourly samples minus the poisoned one; T12Z was "unreachable"
    assert len(cached) == 11


def test_param_search_cli_smoke(tmp_path):
    """run.py --param_search --num_samples 2 end-to-end in a subprocess:
    trial records JSONL + best-point summary in the run folder."""
    import json

    env = dict(os.environ)
    env["WINDSR_PLATFORM"] = "cpu"
    cfg_src = open(os.path.join(REPO, "configs", "tiny.ini")).read()
    cfg_src = cfg_src.replace("root_path = ./runs_root",
                              f"root_path = {tmp_path}/runs_root")
    cfg_src = cfg_src.replace("data_root = ./data",
                              f"data_root = {tmp_path}/data")
    cfg_path = tmp_path / "sweep.ini"
    cfg_path.write_text(cfg_src)

    proc = subprocess.run(
        [sys.executable, "run.py", "--param_search", "--synthetic",
         "--num_samples", "2", "--cfg", str(cfg_path)],
        cwd=REPO, env=env, capture_output=True, text=True, timeout=900,
    )
    assert proc.returncode == 0, proc.stderr[-3000:]
    runs = os.path.join(str(tmp_path), "runs_root", "runs")
    run_dir = os.path.join(runs, os.listdir(runs)[0])
    jsonl = os.path.join(run_dir, "param_search.jsonl")
    assert os.path.exists(jsonl)
    records = [json.loads(l) for l in open(jsonl)]
    assert len(records) == 2
    assert all("PSNR" in r and "point" in r for r in records)


def test_serve_int8_cli_wiring(tmp_path, monkeypatch):
    """run.py --serve --serve_int8 N calibrates the int8 HR head over N
    test-set samples before serving (serve() itself is stubbed out — the
    daemon protocol is covered by the subprocess leg above)."""
    import run as run_mod
    from gan_sr_wind_field_tpu.eval import server as server_mod

    cfg_src = open(os.path.join(REPO, "configs", "tiny.ini")).read()
    cfg_src = cfg_src.replace("root_path = ./runs_root",
                              f"root_path = {tmp_path}/runs_root")
    cfg_src = cfg_src.replace("data_root = ./data",
                              f"data_root = {tmp_path}/data")
    # int8 serving requires the fused-trunk path (interpret-mode on CPU)
    cfg_src = cfg_src.replace("compute_dtype = float32",
                              "compute_dtype = float32\n"
                              "use_fused_trunk = True", 1)
    cfg_path = tmp_path / "tiny_int8.ini"
    cfg_path.write_text(cfg_src)

    captured = {}

    def fake_serve(backend, **kw):
        captured["backend"] = backend

    monkeypatch.setattr(server_mod, "serve", fake_serve)
    run_mod.main([
        "--serve", "0", "--serve_int8", "2", "--synthetic",
        "--synthetic_size", "16", "--cfg", str(cfg_path),
    ])
    sr = captured["backend"]
    assert sr.qhead is not None  # calibration really ran
    assert sr.qhead.wq_main.dtype.name == "int8"


def test_export_pth_under_ema_config_serves_loaded_weights(tmp_path):
    """A reference .pth warm-start under g_ema_decay>0 must deploy the
    LOADED weights: init_state seeds the EMA slot from the RANDOM init,
    and the EMA inference preference must not pick that over the imported
    checkpoint (run.py drops the stale slot on the .pth branch)."""
    import numpy as np

    env = dict(os.environ)
    env["WINDSR_PLATFORM"] = "cpu"
    env["JAX_PLATFORMS"] = "cpu"
    sys.path.insert(0, REPO)
    try:
        import jax

        jax.config.update("jax_platforms", "cpu")
        from gan_sr_wind_field_tpu.config import load_config
        from gan_sr_wind_field_tpu.eval.export import load_exported
        from gan_sr_wind_field_tpu.eval.serve import WindFieldSR
        from gan_sr_wind_field_tpu.train.gan import WindFieldGAN
        from gan_sr_wind_field_tpu.utils.torch_import import (
            load_reference_checkpoint,
            save_reference_checkpoint,
        )

        pth = str(tmp_path / "G_10.pth")
        cfg_src = open(os.path.join(REPO, "configs", "tiny.ini")).read()
        cfg_src = cfg_src.replace("root_path = ./runs_root",
                                  f"root_path = {tmp_path}/runs_root")
        cfg_src = cfg_src.replace("data_root = ./data",
                                  f"data_root = {tmp_path}/data")
        cfg_src = cfg_src.replace("[ENV]",
                                  f"[ENV]\ngenerator_load_path = {pth}")
        cfg_src = cfg_src.replace("[TRAINING]",
                                  "[TRAINING]\ng_ema_decay = 0.9")
        cfg_path = tmp_path / "tiny_ema.ini"
        cfg_path.write_text(cfg_src)

        cfg = load_config(str(cfg_path))
        x = np.arange(16, dtype=np.float32) * 150
        gan = WindFieldGAN(cfg, x, x)
        st = gan.init_state(jax.random.key(7), (1, 4, 4, 4, 4),
                            (1, 16, 16, 4, 3))
        save_reference_checkpoint(pth, st.params_G, gan.G)

        artifact = str(tmp_path / "gen_ema.wsrx")
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "run.py"),
             "--export", artifact, "--synthetic", "--cfg", str(cfg_path)],
            cwd=str(tmp_path), env=env, capture_output=True, text=True,
            timeout=900,
        )
        assert proc.returncode == 0, proc.stderr[-3000:]

        rng = np.random.default_rng(11)
        lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32) * 0.1
        zt = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
        got = load_exported(artifact).upscale(lr, zt)
        params_G, _, _ = load_reference_checkpoint(gan.G, pth)
        want = WindFieldSR(gan, jax.tree.map(np.asarray, params_G)).upscale(
            lr, zt
        )
        np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)
    finally:
        sys.path.remove(REPO)
