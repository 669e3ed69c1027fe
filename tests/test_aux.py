"""Auxiliary subsystem tests: checkpointing, metrics, schedulers, viewer
protocol round-trip."""

import json
import socket
import threading
import time

import jax.numpy as jnp
import numpy as np

from hlod_gaussians_tpu.models import gaussians as gm
from hlod_gaussians_tpu.train import flat, post as post_mod
from hlod_gaussians_tpu.utils import checkpoint as ckpt, scheduler
from hlod_gaussians_tpu.utils.metrics import MetricsLogger
from hlod_gaussians_tpu.viewer.server import ViewerServer


def toy_state(cap=64, n=16, seed=0):
    rng = np.random.default_rng(seed)
    pts = rng.normal(size=(n, 3)).astype(np.float32)
    cols = rng.random((n, 3)).astype(np.float32)
    return gm.create_from_points(pts, cols, capacity=cap, sh_degree=1)


def test_checkpoint_roundtrip_flat(tmp_path):
    ts = flat.init_flat_train(toy_state())
    import dataclasses
    ts = dataclasses.replace(ts, step=jnp.int32(42),
                             max_radii=ts.max_radii + 3.0)
    p = str(tmp_path / "c.npz")
    ckpt.save_checkpoint(p, ts)
    ts2 = ckpt.load_checkpoint(p)
    assert isinstance(ts2, flat.FlatTrainState)
    assert int(ts2.step) == 42
    np.testing.assert_array_equal(np.asarray(ts2.gaussians.xyz),
                                  np.asarray(ts.gaussians.xyz))
    np.testing.assert_array_equal(np.asarray(ts2.max_radii),
                                  np.asarray(ts.max_radii))


def test_checkpoint_roundtrip_post(tmp_path):
    ts = post_mod.init_post_train(toy_state())
    p = str(tmp_path / "p.npz")
    ckpt.save_checkpoint(p, ts)
    ts2 = ckpt.load_checkpoint(p)
    assert isinstance(ts2, post_mod.PostTrainState)
    np.testing.assert_array_equal(np.asarray(ts2.gaussians.nodes),
                                  np.asarray(ts.gaussians.nodes))


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "m.jsonl")
    log = MetricsLogger(p)
    log.log(stage="x", loss=1.5)
    log.log(stage="y", n=3)
    log.close()
    lines = [json.loads(l) for l in open(p)]
    assert lines[0]["stage"] == "x" and lines[0]["loss"] == 1.5
    assert lines[1]["n"] == 3


def test_scheduler_walk_covers_cameras():
    rng = np.random.default_rng(0)
    centers = rng.normal(size=(30, 3))
    order = scheduler.view_schedule(centers, 30, 600, walk=True)
    assert order.shape == (600,)
    assert len(np.unique(order)) >= 25  # walk visits nearly everything
    # consecutive views are mostly neighbors (cache coherence)
    nbrs = scheduler.knn_camera_graph(centers, k=8)
    hits = sum(order[t + 1] in nbrs[order[t]] or order[t + 1] == order[t]
               for t in range(599))
    assert hits > 300


def test_scheduler_epochs():
    order = scheduler.view_schedule(None, 10, 25, walk=False)
    assert order.shape == (25,)
    counts = np.bincount(order, minlength=10)
    assert counts.max() - counts.min() <= 1


def test_viewer_server_roundtrip():
    """Byte-level golden transcript of the SIBR remote handshake
    (gaussian_renderer/network_gui.py:44-57 + hierarchy_viewer.py:538-539):
    request = 4-byte LE length + the client JSON; response = raw H*W*3
    uint8 image + 4-byte LE length + the JSON status blob with the
    reference's keys. Camera decode must apply the Y/Z column sign flips
    (network_gui.py:76-79)."""
    srv = ViewerServer(port=0)
    srv.status = dict(num_gaussians=1234,
                      train_params={"Num_Rendered": 99})
    port = srv.port
    W, H = 32, 24
    seen_cam = {}

    def render_fn(cam, opts):
        assert cam.width == W and cam.height == H
        seen_cam["wv"] = np.asarray(cam.world_view).copy()
        img = np.full((cam.height, cam.width, 3), 7, np.uint8)
        return img

    result = {}
    vm = np.diag([1.0, 1.0, 1.0, 1.0])
    vm[3, :3] = [0.5, -0.25, 2.0]   # translation row (row-vector convention)

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        msg = dict(resolution_x=W, resolution_y=H, fov_x=0.8, fov_y=0.6,
                   z_near=0.01, z_far=100.0, train=False, shs_python=False,
                   rot_scale_python=False, keep_alive=True,
                   scaling_modifier=1.0, slider={"lod": 0.5},
                   view_matrix=list(vm.flatten().astype(float)),
                   view_projection_matrix=list(np.eye(4).flatten().astype(float)))
        payload = json.dumps(msg).encode()
        # golden request framing: exactly len(payload) LE32 then the bytes
        s.sendall(len(payload).to_bytes(4, "little") + payload)
        img = b""
        while len(img) < W * H * 3:
            img += s.recv(W * H * 3 - len(img))
        n = int.from_bytes(s.recv(4), "little")
        verify = b""
        while len(verify) < n:
            verify += s.recv(n - len(verify))
        result["img"] = img
        result["verify"] = verify.decode("ascii")
        s.close()

    t = threading.Thread(target=client)
    t.start()
    served = None
    deadline = time.monotonic() + 10.0
    while time.monotonic() < deadline:
        served = srv.poll_once(render_fn)
        if served is not None:
            break
        time.sleep(0.005)
    t.join(timeout=5)
    srv.close()
    assert served is not None
    # the verify payload is the reference's JSON status blob
    status = json.loads(result["verify"])
    for key in ("iteration", "num_gaussians", "loss", "sh_degree",
                "error", "paused", "train_params"):
        assert key in status, status
    assert status["num_gaussians"] == 1234
    assert status["train_params"]["Num_Rendered"] == 99
    assert len(result["img"]) == W * H * 3
    assert result["img"][0] == 7
    # Y/Z sign flip golden: columns 1,2 negated (network_gui.py:76-77)
    expect = vm.copy()
    expect[:, 1] *= -1
    expect[:, 2] *= -1
    np.testing.assert_allclose(seen_cam["wv"], expect, atol=1e-7)


def test_viewer_server_replays_committed_sibr_fixture():
    """Protocol conformance against a COMMITTED byte fixture (VERDICT r04
    #9): tests/fixtures/viewer/sibr_request.bin holds the exact framed
    bytes a SIBR remote client sends — 4-byte LE length + UTF-8 JSON with
    the full field set network_gui.receive() consumes
    (gaussian_renderer/network_gui.py:44-86) — first a 32x24 camera
    request, then a resolution-0 keepalive. ViewerServer must serve both
    straight off the raw bytes: reply #1 = exactly W*H*3 image bytes +
    LE32-framed ascii status JSON, reply #2 = empty-verify frame."""
    import os

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "viewer",
                           "sibr_request.bin")
    with open(fixture, "rb") as f:
        raw = f.read()

    srv = ViewerServer(port=0)
    srv.status = dict(num_gaussians=77)
    port = srv.port
    W, H = 32, 24
    result = {}

    def render_fn(cam, opts):
        assert (cam.width, cam.height) == (W, H)
        assert opts["slider"]["distance_multiplier"] == 1.0
        return np.full((cam.height, cam.width, 3), 9, np.uint8)

    def client():
        s = socket.create_connection(("127.0.0.1", port))
        s.sendall(raw)                       # replay the fixture verbatim

        def recv_exact(n):
            b = b""
            while len(b) < n:
                b += s.recv(n - len(b))
            return b

        img = recv_exact(W * H * 3)
        n = int.from_bytes(recv_exact(4), "little")
        verify = recv_exact(n)
        n2 = int.from_bytes(recv_exact(4), "little")
        result.update(img=img, verify=verify, empty_len=n2)
        s.close()

    t = threading.Thread(target=client)
    t.start()
    served = 0
    deadline = time.monotonic() + 10.0
    while served < 2 and time.monotonic() < deadline:
        if srv.poll_once(render_fn) is not None:
            served += 1
        else:
            time.sleep(0.005)
    t.join(timeout=5)
    srv.close()
    assert served == 2
    assert len(result["img"]) == W * H * 3 and result["img"][0] == 9
    status = json.loads(result["verify"])
    assert status["num_gaussians"] == 77
    assert result["empty_len"] == 0          # keepalive reply: empty verify


def test_covisibility_graph_from_colmap_db(tmp_path):
    """two_view_geometries -> neighbor table (consistency_graph.py:66-86)."""
    import sqlite3

    from hlod_gaussians_tpu.utils import scheduler

    db = str(tmp_path / "database.db")
    conn = sqlite3.connect(db)
    conn.execute("CREATE TABLE two_view_geometries "
                 "(pair_id INTEGER PRIMARY KEY, rows INTEGER)")

    def pid(a, b):
        return a * 2147483647 + b

    # triangle 1-2-3 plus a weak edge to 4
    for a, b, m in ((1, 2, 50), (2, 3, 80), (1, 3, 30), (3, 4, 5)):
        conn.execute("INSERT INTO two_view_geometries VALUES (?, ?)",
                     (pid(a, b), m))
    conn.commit()
    conn.close()

    ids, neighbors, weights = scheduler.load_covisibility_graph(db)
    assert ids == [1, 2, 3, 4]
    i3 = ids.index(3)
    assert set(neighbors[i3].tolist()) >= {ids.index(1), ids.index(2),
                                           ids.index(4)}
    assert weights.max() == 80
    # decode round trip
    assert scheduler.pair_id_to_image_ids(pid(7, 9)) == (7, 9)
    # the walk runs on it
    import numpy as np
    order = scheduler.metropolis_hastings_walk(
        neighbors, 50, np.random.default_rng(0))
    assert len(order) == 50 and order.max() < 4


def test_ssim_custom_vjp_matches_autodiff():
    """The conv-forward / shift-add-backward blur split must give the same
    SSIM gradient as stock autodiff through the shift-add blur (the blur
    is self-adjoint: symmetric window + SAME zero padding)."""
    import jax
    import jax.numpy as jnp
    import numpy as np
    from hlod_gaussians_tpu.ops import ssim as sm

    rng = np.random.default_rng(3)
    a = jnp.asarray(rng.random((3, 37, 53)).astype(np.float32))
    b = jnp.asarray(rng.random((3, 37, 53)).astype(np.float32))

    def ssim_ref(img1, img2):
        w = sm._gaussian_window(11)
        blur = lambda x: sm._blur_shift_add(x, w)
        mu1, mu2 = blur(img1), blur(img2)
        s1 = blur(img1 * img1) - mu1 * mu1
        s2 = blur(img2 * img2) - mu2 * mu2
        s12 = blur(img1 * img2) - mu1 * mu2
        c1, c2 = 0.01 ** 2, 0.03 ** 2
        m = ((2 * mu1 * mu2 + c1) * (2 * s12 + c2)) / (
            (mu1 * mu1 + mu2 * mu2 + c1) * (s1 + s2 + c2))
        return m.mean()

    v = float(sm.ssim(a, b))
    v_ref = float(ssim_ref(a, b))
    assert abs(v - v_ref) < 1e-6

    g = np.asarray(jax.grad(lambda x: sm.ssim(x, b))(a))
    g_ref = np.asarray(jax.grad(lambda x: ssim_ref(x, b))(a))
    s = np.abs(g_ref).max() + 1e-12
    np.testing.assert_allclose(g / s, g_ref / s, atol=1e-5)
