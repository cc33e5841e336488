"""Warm-process server protocol tests."""

import io
import json

import numpy as np

from nvfpcc_tpu.io.ply import write_ply_points
from nvfpcc_tpu.serve import handle, serve


def test_bad_requests():
    assert handle({})["ok"] is False
    assert handle({"cmd": 5})["ok"] is False
    assert handle({"cmd": "eval", "args": [1, 2]})["ok"] is False
    r = handle({"cmd": "nonsense"})
    assert r["ok"] is False


def test_serve_loop_eval(tmp_path):
    p = str(tmp_path / "c.ply")
    rng = np.random.default_rng(0)
    write_ply_points(p, np.unique(rng.integers(0, 64, (100, 3)), axis=0))
    reqs = [
        {"cmd": "eval", "args": [p, p, "--depth", "6", "--platform", "cpu"]},
        {"cmd": "bogus"},
        {"cmd": "quit"},
        {"cmd": "eval", "args": [p, p]},  # after quit: never executed
    ]
    out = io.StringIO()
    serve(io.StringIO("\n".join(json.dumps(r) for r in reqs) + "\n"), out)
    lines = [json.loads(l) for l in out.getvalue().splitlines()]
    assert len(lines) == 2  # quit stopped the loop
    assert lines[0] == {"ok": True, "status": 0}
    assert lines[1]["ok"] is False
