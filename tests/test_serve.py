"""HTTP serving surface (scripts/serve.py): full session lifecycle over a
live in-process server with a tiny model."""
import base64
import io
import json
import sys
import threading
import urllib.request
from pathlib import Path

import numpy as np
import jax

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

from pvpuformer_tpu.inference.controller import InteractiveController
from pvpuformer_tpu.inference.predictor import PredictorConfig
from pvpuformer_tpu.models.vpu import init_vpu

from test_models import tiny_cfg


def _png_b64(arr: np.ndarray) -> str:
    from PIL import Image
    buf = io.BytesIO()
    Image.fromarray(arr).save(buf, format="PNG")
    return base64.b64encode(buf.getvalue()).decode("ascii")


def _req(base, path, payload=None, method=None):
    data = json.dumps(payload).encode() if payload is not None else None
    req = urllib.request.Request(base + path, data=data, method=method)
    if data is not None:
        req.add_header("Content-Type", "application/json")
    with urllib.request.urlopen(req, timeout=120) as r:
        return json.loads(r.read())


def test_serve_session_lifecycle():
    from scripts.serve import build_server

    mcfg = tiny_cfg()
    params = init_vpu(jax.random.key(0), mcfg)
    cfg = PredictorConfig(model=mcfg, target_size=(64, 64), min_crop_size=32)

    def make_controller():
        return InteractiveController(params, cfg)

    srv = build_server(make_controller)
    thread = threading.Thread(target=srv.serve_forever, daemon=True)
    thread.start()
    base = f"http://127.0.0.1:{srv.server_address[1]}"
    try:
        assert _req(base, "/healthz")["ok"] is True

        r = np.random.default_rng(0)
        image = (r.uniform(size=(64, 64, 3)) * 255).astype(np.uint8)
        sid = _req(base, "/session", {"image": _png_b64(image)})["session"]

        out = _req(base, "/click", {"session": sid, "x": 30, "y": 20,
                                    "positive": True})
        assert out["clicks"] == 1 and out["object_area"] >= 0
        out = _req(base, "/click", {"session": sid, "x": 50, "y": 40,
                                    "positive": False})
        assert out["clicks"] == 2
        assert _req(base, "/undo", {"session": sid})["clicks"] == 1
        assert _req(base, "/finish", {"session": sid})["objects"] == 1

        # mask round-trip: uint16 PNG with object ids
        from PIL import Image
        m64 = _req(base, "/mask?session=" + sid, method="GET")["mask"]
        mask = np.asarray(Image.open(io.BytesIO(base64.b64decode(m64))))
        assert mask.shape == (64, 64) and set(np.unique(mask)) <= {0, 1}
        v64 = _req(base, "/vis?session=" + sid, method="GET")["image"]
        vis = np.asarray(Image.open(io.BytesIO(base64.b64decode(v64))))
        assert vis.shape == (64, 64, 3)

        # init-mask injection
        init = np.zeros((64, 64), np.uint8)
        init[8:24, 8:24] = 255
        _req(base, "/set_mask", {"session": sid, "mask": _png_b64(init)})

        # unknown session -> 404
        try:
            _req(base, "/click", {"session": "nope", "x": 1, "y": 1,
                                  "positive": True})
            raise AssertionError("expected 404")
        except urllib.error.HTTPError as e:
            assert e.code == 404

        _req(base, "/session?session=" + sid, method="DELETE")
        assert _req(base, "/healthz")["sessions"] == 0
    finally:
        srv.shutdown()
