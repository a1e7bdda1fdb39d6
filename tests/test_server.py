"""HTTP serving daemon tests (eval/server.py).

Micro-batching semantics are tested against a fake backend (exact,
deterministic); the HTTP protocol round-trips against a real tiny
WindFieldSR on the CPU backend.
"""

import io
import json
import threading
import urllib.error
import urllib.request

import numpy as np
import pytest

from gan_sr_wind_field_tpu.eval.server import MicroBatcher, serve, warmup


class _FakeBackend:
    """upscale = lr * 2; records the batch sizes it was called with."""

    scale = 4

    def __init__(self, fail=False):
        self.calls = []
        self.fail = fail

    def upscale(self, lr, z):
        assert lr.ndim == 5 and z.ndim == 5 and lr.shape[0] == z.shape[0]
        self.calls.append(lr.shape[0])
        if self.fail:
            raise RuntimeError("backend exploded")
        return lr * 2.0


def _sample(rng, xy=4):
    lr = rng.standard_normal((xy, xy, 4, 4)).astype(np.float32)
    z = rng.standard_normal((xy * 4, xy * 4, 4, 1)).astype(np.float32)
    return lr, z


def test_submit_many_batches_and_pads_pow2(rng):
    be = _FakeBackend()
    b = MicroBatcher(be, max_batch=8, max_wait_ms=250.0)
    try:
        lrs, zs = zip(*[_sample(rng) for _ in range(3)])
        outs = b.submit_many(list(lrs), list(zs))
        for lr, out in zip(lrs, outs):
            np.testing.assert_array_equal(out, lr * 2.0)
        # all three enqueued before the window closed -> ONE padded call
        assert be.calls == [4]
        assert b.stats["requests"] == 3
        assert b.stats["batches"] == 1
        assert b.stats["batched_samples"] == 3
        assert b.stats["padded_samples"] == 1
        assert b.stats["max_batch_seen"] == 3
    finally:
        b.close()


def test_single_submit_no_padding(rng):
    be = _FakeBackend()
    b = MicroBatcher(be, max_batch=8, max_wait_ms=1.0)
    try:
        lr, z = _sample(rng)
        out = b.submit(lr, z)
        np.testing.assert_array_equal(out, lr * 2.0)
        assert be.calls == [1]  # batch-1 is never padded
        assert b.stats["padded_samples"] == 0
    finally:
        b.close()


def test_mixed_shapes_split_into_separate_calls(rng):
    be = _FakeBackend()
    b = MicroBatcher(be, max_batch=8, max_wait_ms=250.0)
    try:
        a_lr, a_z = _sample(rng, xy=4)
        c_lr, c_z = _sample(rng, xy=6)
        results = {}

        def go(name, lr, z):
            results[name] = b.submit(lr, z)

        ts = [threading.Thread(target=go, args=("a", a_lr, a_z)),
              threading.Thread(target=go, args=("c", c_lr, c_z))]
        for t in ts:
            t.start()
        for t in ts:
            t.join()
        np.testing.assert_array_equal(results["a"], a_lr * 2.0)
        np.testing.assert_array_equal(results["c"], c_lr * 2.0)
        assert sorted(be.calls) == [1, 1]  # never stacked across shapes
    finally:
        b.close()


def test_backend_error_propagates_to_all_waiters(rng):
    b = MicroBatcher(_FakeBackend(fail=True), max_batch=4,
                     max_wait_ms=100.0)
    try:
        lrs, zs = zip(*[_sample(rng) for _ in range(2)])
        with pytest.raises(RuntimeError, match="backend exploded"):
            b.submit_many(list(lrs), list(zs))
        assert b.stats["errors"] == 1
    finally:
        b.close()


def test_close_fails_queued_jobs_promptly(rng):
    """close() must error out queued jobs, not leave them blocking until
    their submit timeout."""

    class _SlowBackend(_FakeBackend):
        def __init__(self):
            super().__init__()
            self.started = threading.Event()
            self.release = threading.Event()

        def upscale(self, lr, z):
            self.started.set()
            assert self.release.wait(10.0)
            return super().upscale(lr, z)

    be = _SlowBackend()
    b = MicroBatcher(be, max_batch=1, max_wait_ms=1.0)
    lr, z = _sample(rng)
    res = {}

    def go(name):
        try:
            res[name] = b.submit(lr, z, timeout=30.0)
        except BaseException as e:
            res[name] = e

    t1 = threading.Thread(target=go, args=("a",))
    t1.start()
    assert be.started.wait(5.0)  # dispatcher is inside the backend
    t2 = threading.Thread(target=go, args=("b",))
    t2.start()
    import time as _time

    _time.sleep(0.2)  # let job b reach the queue behind the stuck batch
    closer = threading.Thread(target=b.close)
    closer.start()  # sets _stop, then blocks joining the dispatcher
    _time.sleep(0.1)
    be.release.set()  # in-flight batch completes; dispatcher exits
    closer.join(10.0)
    t1.join(10.0)
    t2.join(10.0)
    np.testing.assert_array_equal(res["a"], lr * 2.0)
    assert isinstance(res["b"], RuntimeError)
    assert "shutting down" in str(res["b"])


def test_max_batch_respected(rng):
    be = _FakeBackend()
    b = MicroBatcher(be, max_batch=2, max_wait_ms=250.0, pad_pow2=True)
    try:
        lrs, zs = zip(*[_sample(rng) for _ in range(5)])
        b.submit_many(list(lrs), list(zs))
        assert max(be.calls) <= 2 and sum(be.calls) == 5
    finally:
        b.close()


def test_warmup_runs_each_batch_size():
    be = _FakeBackend()
    warmup(be, (4, 4, 4, 4), (16, 16, 4, 1), [1, 4])
    assert be.calls == [1, 4]


def test_health_reports_norm_stats():
    """Model i/o is normalized-space; /v1/health must surface the
    physical-unit factors when the backend carries them."""
    import urllib.request  # noqa: F401  (via _get_json)

    be = _FakeBackend()
    be.norm_stats = {"uvw_max": 23.5, "z_min": 10.0}
    srv = serve(be, host="127.0.0.1", port=0, max_wait_ms=1.0)
    try:
        host, port = srv.server_address
        h = _get_json(f"http://{host}:{port}/v1/health")
        assert h["norm_stats"] == {"uvw_max": 23.5, "z_min": 10.0}
    finally:
        srv.close()


# ------------------------------------------------------------- HTTP tier
def _post(url, timeout=120.0, **arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    req = urllib.request.Request(
        url, data=buf.getvalue(), method="POST",
        headers={"Content-Type": "application/octet-stream"},
    )
    with urllib.request.urlopen(req, timeout=timeout) as r:
        return np.load(io.BytesIO(r.read()))


def _get_json(url):
    with urllib.request.urlopen(url, timeout=30.0) as r:
        return json.loads(r.read())


@pytest.fixture(scope="module")
def http_server():
    from test_serve import _make_sr

    sr, _ = _make_sr()
    srv = serve(sr, host="127.0.0.1", port=0, max_batch=4,
                max_wait_ms=20.0)
    host, port = srv.server_address
    yield f"http://{host}:{port}", sr
    srv.close()


def test_http_single_roundtrip(http_server, rng):
    url, sr = http_server
    lr, z = _sample(rng)
    out = _post(f"{url}/v1/upscale", lr=lr, z=z)["sr"]
    assert out.shape == (16, 16, 4, 3)
    np.testing.assert_allclose(out, sr.upscale(lr, z), rtol=1e-5,
                               atol=1e-6)


def test_http_batched_request(http_server, rng):
    url, sr = http_server
    lr = rng.standard_normal((3, 4, 4, 4, 4)).astype(np.float32)
    z = rng.standard_normal((3, 16, 16, 4, 1)).astype(np.float32)
    out = _post(f"{url}/v1/upscale", lr=lr, z=z)["sr"]
    assert out.shape == (3, 16, 16, 4, 3)
    for i in range(3):
        np.testing.assert_allclose(out[i], sr.upscale(lr[i], z[i]),
                                   rtol=1e-5, atol=1e-6)


def test_http_health_and_stats(http_server):
    url, _ = http_server
    h = _get_json(f"{url}/v1/health")
    assert h["status"] == "ok" and h["scale"] == 4
    s = _get_json(f"{url}/v1/stats")
    assert s["requests"] >= 1 and s["batches"] >= 1
    lat = s["request_latency"]
    assert lat["count"] >= 1
    assert 0.0 <= lat["p50_ms"] <= lat["p95_ms"] <= lat["p99_ms"]
    assert s["batch_duration"]["count"] >= 1


def test_stats_snapshot_percentiles(rng):
    be = _FakeBackend()
    b = MicroBatcher(be, max_batch=4, max_wait_ms=100.0)
    try:
        lrs, zs = zip(*[_sample(rng) for _ in range(3)])
        b.submit_many(list(lrs), list(zs))
        s = b.stats_snapshot()
        assert s["requests"] == 3
        lat = s["request_latency"]
        assert lat["count"] == 3
        assert lat["p50_ms"] <= lat["p99_ms"]
        assert lat["mean_ms"] >= 0.0
        # request latency includes the batching wait; batch duration is
        # just the backend call, so it can never exceed the max latency
        assert s["batch_duration"]["p99_ms"] <= lat["p99_ms"] + 1e-6
    finally:
        b.close()


def test_http_bad_payload_is_400(http_server):
    url, _ = http_server
    req = urllib.request.Request(
        f"{url}/v1/upscale", data=b"not an npz", method="POST"
    )
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(req, timeout=30.0)
    assert ei.value.code == 400


def test_http_mismatched_z_is_400(http_server, rng):
    """z geometry inconsistent with lr+scale must be a clear 400 at the
    HTTP tier, not an opaque backend-trace 500 (advisor r2)."""
    url, _ = http_server
    lr, z = _sample(rng)
    for bad_z in (
        z[: lr.shape[0] * 2],          # wrong horizontal extent (8 != 16)
        z[:, :, :2],                   # wrong zl
        np.repeat(z, 2, axis=-1),      # wrong channel count
    ):
        req = urllib.request.Request(
            f"{url}/v1/upscale",
            data=_npz_bytes(lr=lr, z=bad_z), method="POST",
        )
        with pytest.raises(urllib.error.HTTPError) as ei:
            urllib.request.urlopen(req, timeout=30.0)
        assert ei.value.code == 400
        assert b"inconsistent" in ei.value.read()


def _npz_bytes(**arrays):
    buf = io.BytesIO()
    np.savez(buf, **arrays)
    return buf.getvalue()


def test_http_oversize_content_length_closes_connection(http_server):
    """A 400 sent before the body was read must close the connection —
    keeping it open would desync HTTP/1.1 keep-alive (the unread body
    bytes would be parsed as the next request line)."""
    import socket

    url, _ = http_server
    host, port = url[len("http://"):].split(":")
    with socket.create_connection((host, int(port)), timeout=30.0) as s:
        s.sendall(
            b"POST /v1/upscale HTTP/1.1\r\n"
            b"Host: x\r\nContent-Length: 2147483648\r\n\r\n"
        )
        s.settimeout(30.0)
        data = b""
        while b"\r\n\r\n" not in data:
            chunk = s.recv(4096)
            if not chunk:
                break
            data += chunk
        head = data.split(b"\r\n\r\n", 1)[0].lower()
        assert b" 400 " in data.split(b"\r\n", 1)[0]
        assert b"connection: close" in head
        # server must actually close: drain to EOF instead of hanging
        while True:
            chunk = s.recv(4096)
            if not chunk:
                break


def test_http_unknown_path_is_404(http_server):
    url, _ = http_server
    with pytest.raises(urllib.error.HTTPError) as ei:
        urllib.request.urlopen(f"{url}/nope", timeout=30.0)
    assert ei.value.code == 404


def test_http_serves_exported_artifact(tmp_path, rng):
    """The config-free CLI path: daemon over a .wsrx export artifact."""
    from test_export import _make_gan

    from gan_sr_wind_field_tpu.eval.export import (
        export_generator,
        load_exported,
    )

    gan, params_G = _make_gan()
    path = str(tmp_path / "gen.wsrx")
    export_generator(gan, params_G, path)
    backend = load_exported(path)

    srv = serve(backend, host="127.0.0.1", port=0, max_batch=4,
                max_wait_ms=10.0)
    try:
        host, port = srv.server_address
        lr, z = _sample(rng)
        out = _post(f"http://{host}:{port}/v1/upscale", lr=lr, z=z)["sr"]
        np.testing.assert_allclose(out, backend.upscale(lr, z),
                                   rtol=1e-5, atol=1e-6)
        h = _get_json(f"http://{host}:{port}/v1/health")
        assert h["backend"] == "ExportedSR"
    finally:
        srv.close()


def test_http_upscale_physical_roundtrip(rng):
    """POST /v1/upscale_physical: m/s wind in, m/s SR out — must equal the
    backend's own upscale_physical."""
    from test_serve import _make_sr, _raw_fields, _stats

    sr, _ = _make_sr()
    sr.norm_stats = _stats()
    srv = serve(sr, host="127.0.0.1", port=0, max_batch=4, max_wait_ms=5.0)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        h = _get_json(f"{url}/v1/health")
        assert h["lr_channels"] == ["u", "v", "w", "z"]
        assert h["norm_stats"]["uvw_max"] == 21.5

        z, zag, u, v, w, p = _raw_fields(rng)
        lr_uvw = np.stack([u, v, w], -1)[::4, ::4]
        out = _post(f"{url}/v1/upscale_physical", lr_uvw=lr_uvw, z=z)["sr"]
        want = sr.upscale_physical(lr_uvw, z)
        np.testing.assert_allclose(out, want, rtol=1e-5, atol=1e-5)
    finally:
        srv.close()


def test_http_upscale_physical_without_stats_is_400(http_server, rng):
    """The module fixture's backend carries no norm_stats — the physical
    endpoint must refuse cleanly."""
    url, _ = http_server
    lr_uvw = rng.standard_normal((4, 4, 4, 3)).astype(np.float32)
    z = rng.standard_normal((16, 16, 4)).astype(np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{url}/v1/upscale_physical", lr_uvw=lr_uvw, z=z)
    assert ei.value.code == 400
    assert "norm_stats" in ei.value.read().decode()


# ----------------------------------------------------- tiled HTTP endpoint
class _FakeSRBackend:
    """Pointwise-linear SR fake: nearest-up(lr[..., :3] * 2) at scale 4.

    Per-LR-pixel, so every tile computes identical values on overlaps and
    the cosine blend must reconstruct the map EXACTLY (the weights form a
    partition of unity over identical contributions)."""

    scale = 4

    def __init__(self):
        self.calls = []

    def upscale(self, lr, z):
        assert lr.ndim == 5 and z.ndim == 5 and lr.shape[0] == z.shape[0]
        self.calls.append(lr.shape[0])
        up = np.repeat(np.repeat(lr[..., :3] * 2.0, 4, axis=1), 4, axis=2)
        return up.astype(np.float32)


def _fake_sr_expected(lr):
    return np.repeat(np.repeat(lr[..., :3] * 2.0, 4, axis=0),
                     4, axis=1).astype(np.float32)


def test_tiled_upscale_via_exact_for_linear_map(rng):
    from gan_sr_wind_field_tpu.eval.server import tiled_upscale_via

    calls = []

    def submit_many(lrs, zs):
        assert len(lrs) == len(zs)
        calls.append(len(lrs))
        return [_fake_sr_expected(l) for l in lrs]

    lr = rng.standard_normal((10, 7, 4, 4)).astype(np.float32)
    z = rng.standard_normal((40, 28, 4, 1)).astype(np.float32)
    out = tiled_upscale_via(submit_many, lr, z, 4, tile=4, overlap=2)
    assert out.shape == (40, 28, 4, 3)
    np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                               atol=1e-6)
    # all tiles must go through ONE submit_many call so they stack with
    # everything else in flight (X: {0,2,4,6} x Y: {0,2,3} = 12 tiles)
    assert calls == [12]


def test_tiled_upscale_via_rejects_bad_overlap(rng):
    from gan_sr_wind_field_tpu.eval.server import tiled_upscale_via

    lr = rng.standard_normal((10, 7, 4, 4)).astype(np.float32)
    z = rng.standard_normal((40, 28, 4, 1)).astype(np.float32)
    with pytest.raises(ValueError, match="overlap"):
        tiled_upscale_via(lambda a, b: a, lr, z, 4, tile=4, overlap=4)


@pytest.fixture()
def tiled_fake_server():
    be = _FakeSRBackend()
    srv = serve(be, host="127.0.0.1", port=0, max_batch=8,
                max_wait_ms=5.0, tile=4, tile_overlap=2)
    host, port = srv.server_address
    yield f"http://{host}:{port}", be
    srv.close()


def test_http_tiled_roundtrip(tiled_fake_server, rng):
    url, _ = tiled_fake_server
    h = _get_json(f"{url}/v1/health")
    assert h["tile"] == 4 and h["tile_overlap"] == 2
    lr = rng.standard_normal((10, 6, 4, 4)).astype(np.float32)
    z = rng.standard_normal((40, 24, 4, 1)).astype(np.float32)
    out = _post(f"{url}/v1/upscale_tiled", lr=lr, z=z)["sr"]
    assert out.shape == (40, 24, 4, 3)
    np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                               atol=1e-6)


def test_http_tiled_overlap_override(tiled_fake_server, rng):
    """Clients may pick the overlap (a coordinate choice); the linear map
    stays exact at ANY valid overlap, and an invalid one is a clean 400."""
    url, _ = tiled_fake_server
    lr = rng.standard_normal((9, 5, 4, 4)).astype(np.float32)
    z = rng.standard_normal((36, 20, 4, 1)).astype(np.float32)
    out = _post(f"{url}/v1/upscale_tiled", lr=lr, z=z,
                overlap=np.int64(3))["sr"]
    np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                               atol=1e-6)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{url}/v1/upscale_tiled", lr=lr, z=z, overlap=np.int64(4))
    assert ei.value.code == 400
    assert "overlap" in ei.value.read().decode()


def test_oversized_default_overlap_clamps_to_quarter_tile(rng):
    """run.py serves with tile = training LR extent (16 at scale 4, 4 for
    tiny configs) but the overlap default is 16 — an oversized default
    must degrade to the library tier's 25% ratio rather than 400 every
    default-overlap request."""
    be = _FakeSRBackend()
    srv = serve(be, host="127.0.0.1", port=0, max_batch=8,
                max_wait_ms=5.0, tile=4, tile_overlap=16)
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        assert _get_json(f"{url}/v1/health")["tile_overlap"] == 1
        lr = rng.standard_normal((9, 5, 4, 4)).astype(np.float32)
        z = rng.standard_normal((36, 20, 4, 1)).astype(np.float32)
        out = _post(f"{url}/v1/upscale_tiled", lr=lr, z=z)["sr"]
        np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                                   atol=1e-6)
    finally:
        srv.close()


def test_http_tiled_rejects_batched_input(tiled_fake_server, rng):
    url, _ = tiled_fake_server
    lr = rng.standard_normal((2, 8, 8, 4, 4)).astype(np.float32)
    z = rng.standard_normal((2, 32, 32, 4, 1)).astype(np.float32)
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(f"{url}/v1/upscale_tiled", lr=lr, z=z)
    assert ei.value.code == 400
    assert "ONE volume" in ei.value.read().decode()


def test_http_tiled_matches_library_tiled(rng):
    """Daemon tiling (host-side blend over the shared dispatcher stream)
    must match WindFieldSR.upscale_tiled (device-resident pipeline) — same
    tile coordinates + raised-cosine window by construction."""
    from test_serve import _make_sr

    sr, _ = _make_sr()
    srv = serve(sr, host="127.0.0.1", port=0, max_batch=8,
                max_wait_ms=5.0, tile=4, tile_overlap=2)
    try:
        host, port = srv.server_address
        lr = rng.standard_normal((6, 6, 4, 4)).astype(np.float32) * 0.1
        z = rng.standard_normal((24, 24, 4, 1)).astype(np.float32)
        out = _post(f"http://{host}:{port}/v1/upscale_tiled",
                    lr=lr, z=z)["sr"]
        want = sr.upscale_tiled(lr, z, tile=4, overlap=2)
        np.testing.assert_allclose(out, want, rtol=1e-4, atol=1e-5)
    finally:
        srv.close()


def test_tiled_upscale_via_pads_small_dims_to_tile(rng):
    """Client extents smaller than the server tile must NOT change the
    submitted tensor shape (each new jit shape is a minutes-long remote
    compile that stalls the shared dispatcher): the volume is edge-padded
    up to the configured tile and the output cropped back."""
    from gan_sr_wind_field_tpu.eval.server import tiled_upscale_via

    shapes = []

    def submit_many(lrs, zs):
        shapes.extend(l.shape for l in lrs)
        return [_fake_sr_expected(l) for l in lrs]

    # one dim below the tile
    lr = rng.standard_normal((10, 3, 4, 4)).astype(np.float32)
    z = rng.standard_normal((40, 12, 4, 1)).astype(np.float32)
    out = tiled_upscale_via(submit_many, lr, z, 4, tile=4, overlap=2)
    assert out.shape == (40, 12, 4, 3)
    np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                               atol=1e-6)
    # both dims below the tile (single padded submit)
    lr2 = rng.standard_normal((3, 2, 4, 4)).astype(np.float32)
    z2 = rng.standard_normal((12, 8, 4, 1)).astype(np.float32)
    out2 = tiled_upscale_via(submit_many, lr2, z2, 4, tile=4, overlap=2)
    assert out2.shape == (12, 8, 4, 3)
    np.testing.assert_allclose(out2, _fake_sr_expected(lr2), rtol=1e-5,
                               atol=1e-6)
    assert shapes and all(s == (4, 4, 4, 4) for s in shapes)


def test_http_tiled_small_volume_roundtrip(tiled_fake_server, rng):
    """A sub-tile request is served (padded server-side), not 400d, and
    the backend only ever sees the warmed tile shape."""
    url, be = tiled_fake_server
    lr = rng.standard_normal((3, 2, 4, 4)).astype(np.float32)
    z = rng.standard_normal((12, 8, 4, 1)).astype(np.float32)
    out = _post(f"{url}/v1/upscale_tiled", lr=lr, z=z)["sr"]
    assert out.shape == (12, 8, 4, 3)
    np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                               atol=1e-6)


def test_strict_shapes_pins_upscale_but_not_tiled(rng):
    """allowed_shapes rejects off-shape /v1/upscale requests (each new
    shape would jit a new program) while /v1/upscale_tiled still serves
    ANY extent — it only ever submits the server-chosen tile shape."""
    be = _FakeSRBackend()
    srv = serve(be, host="127.0.0.1", port=0, max_batch=8,
                max_wait_ms=5.0, tile=4, tile_overlap=2,
                allowed_shapes=[(4, 4, 4, 4)])
    try:
        host, port = srv.server_address
        url = f"http://{host}:{port}"
        assert _get_json(f"{url}/v1/health")["allowed_shapes"] == [
            [4, 4, 4, 4]
        ]
        lr = rng.standard_normal((4, 4, 4, 4)).astype(np.float32)
        z = rng.standard_normal((16, 16, 4, 1)).astype(np.float32)
        out = _post(f"{url}/v1/upscale", lr=lr, z=z)["sr"]
        np.testing.assert_allclose(out, _fake_sr_expected(lr), rtol=1e-5,
                                   atol=1e-6)
        bad_lr = rng.standard_normal((5, 4, 4, 4)).astype(np.float32)
        bad_z = rng.standard_normal((20, 16, 4, 1)).astype(np.float32)
        with pytest.raises(urllib.error.HTTPError) as ei:
            _post(f"{url}/v1/upscale", lr=bad_lr, z=bad_z)
        assert ei.value.code == 400
        assert "pins input shapes" in ei.value.read().decode()
        # same extent through the tiled endpoint is served
        out2 = _post(f"{url}/v1/upscale_tiled", lr=bad_lr, z=bad_z)["sr"]
        np.testing.assert_allclose(out2, _fake_sr_expected(bad_lr),
                                   rtol=1e-5, atol=1e-6)
    finally:
        srv.close()
