"""Fast serving-export smoke tests that run in the DEFAULT suite.

tests/test_serving.py is slow-marked at module level, which deselects
every export round-trip from the default `pytest` run — that is exactly
how the symbolic-batch decoder-dispatch crash (round-3 review finding)
went unnoticed: `apply_decoder`'s `N < _COMPOSE_MIN_N` comparison is
undecidable for a symbolic batch whenever the folded T < 32, so the
default `export_serving --fused_num_frames 160` (T=10) bundle export
raised InconclusiveDimensionOperation. This file keeps one cheap
symbolic export of each program shape in the fast suite.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.serving import export as export_lib


@pytest.fixture(scope="module")
def model():
    return registry.create_model("gaze_grcn")


def test_fused_symbolic_export_small_t(model):
    """num_frames=64 -> T=4 < _COMPOSE_MIN_N: the decoder dispatch must
    route symbolic-batch traces to the composed path, not crash."""
    prog = export_lib.export_fused_predict(
        model, num_frames=64, symbolic_batch=True, platforms=("cpu",))
    # one shape check via abstract eval of the exported signature
    assert prog.in_avals[-1].shape[1] == 64


def test_stream_symbolic_export_small_chunk(model):
    prog = export_lib.export_stream_step(
        model, chunk_len=2, symbolic_batch=True, platforms=("cpu",))
    out_tree = prog.out_avals
    assert any(a.shape[-2:] == (49, 49) for a in out_tree)


def test_predict_symbolic_export_runs(model):
    """Export predict(params, frames, c3d) symbolically AND call it —
    pins that a non-default batch runs through the exported program."""
    import dataclasses

    prog = export_lib.export_predict(
        model, symbolic_batch=True, platforms=("cpu",))
    cfg = model.cfg
    t = cfg.n_lstm_steps
    # params tree must match the exported (pallas-free) model's
    portable = registry.create_model(
        cfg.name, dataclasses.replace(cfg, use_pallas=False))
    params = portable.init(jnp.asarray([0, 0], jnp.uint32))
    frames = np.zeros((2, t, cfg.image_height, cfg.image_width, 3),
                      np.float32)
    feats = np.zeros((2, t, cfg.dim_feature, 7, 7), np.float32)
    maps = prog.call(params, frames, feats)
    assert maps.shape == (2, t, 49, 49)
