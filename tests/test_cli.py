"""CLI integration test: `run.py --train --synthetic` end-to-end in a
subprocess on the tiny config (the reference's local smoke run, SURVEY §4)."""

import os
import subprocess
import sys

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
    assert any(n.startswith("ckpt_") for n in os.listdir(run_dir))
    assert any(
        n.startswith("val_imgs__it_")
        for n in os.listdir(os.path.join(run_dir, "images"))
    )
