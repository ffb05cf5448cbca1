"""Tests for visualization, profiler hooks, prefetch, writer, config."""

import json
import os

import jax
import pytest
import numpy as np

from recurrent_gaze_prediction_tpu.config import ExperimentConfig
from recurrent_gaze_prediction_tpu.data import synthetic
from recurrent_gaze_prediction_tpu.data.prefetch import prefetch_batches
from recurrent_gaze_prediction_tpu.eval import visualize
from recurrent_gaze_prediction_tpu.train.writer import MetricWriter


def test_imshow_grid_shapes():
    maps = np.random.RandomState(0).rand(10, 49, 49)
    grid = visualize.imshow_grid(maps, ncols=4)
    # 3 rows x 4 cols with 1px padding
    assert grid.shape == (3 * 50 - 1, 4 * 50 - 1)
    rgb = np.random.RandomState(1).rand(4, 20, 20, 3)
    grid3 = visualize.imshow_grid(rgb, ncols=2)
    assert grid3.shape == (2 * 21 - 1, 2 * 21 - 1, 3)


def test_salicon_json_roundtrip(tmp_path):
    maps = np.random.RandomState(2).rand(3, 49, 49)
    path = str(tmp_path / "results.json")
    visualize.save_salicon_json(path, [1, 2, 3], maps)
    records = json.load(open(path))
    assert [r["image_id"] for r in records] == [1, 2, 3]
    decoded = visualize.decode_salicon_result(records[0])
    assert decoded.shape == (49, 49)
    # base64 PNG roundtrip preserves the normalized map up to 8-bit
    expected = visualize._to_uint8(maps[0])
    np.testing.assert_array_equal(decoded, expected)


def test_prefetch_batches_device_resident():
    data = synthetic.make_clip_windows(4, 3, seed=0)
    batches = list(prefetch_batches(data, 2, max_batches=3))
    assert len(batches) == 3
    for batch in batches:
        assert isinstance(batch["frames"], jax.Array)
        assert batch["frames"].shape == (2, 3, 98, 98, 3)


def test_metric_writer_jsonl(tmp_path):
    w = MetricWriter(str(tmp_path), use_tensorboard=False)
    w.scalars(1, {"loss": 0.5})
    w(2, {"loss": 0.25})
    w.close()
    records = [json.loads(line)
               for line in open(tmp_path / "metrics.jsonl")]
    assert records[0]["loss"] == 0.5 and records[1]["step"] == 2


def test_config_roundtrip(tmp_path):
    exp = ExperimentConfig()
    exp.model.batch_size = 28
    exp.optimizer.initial_learning_rate = 1e-4
    exp.dataset = "hollywood2"
    path = str(tmp_path / "config.json")
    exp.dump(path)
    back = ExperimentConfig.load(path)
    assert back.model.batch_size == 28
    assert back.optimizer.initial_learning_rate == 1e-4
    assert back.dataset == "hollywood2"


def test_config_overrides_type_coercion():
    exp = ExperimentConfig()
    exp.apply_overrides({"model.batch_size": "16",
                         "optimizer.initial_learning_rate": 0.01,
                         "schedule.max_steps": None})
    assert exp.model.batch_size == 16
    assert exp.schedule.max_steps == 100000  # None skipped


def test_profiler_hooks_run(tmp_path):
    from recurrent_gaze_prediction_tpu.train import profiler

    @jax.jit
    def f(x):
        return x * 2.0

    profiler.profile_steps(f, (jax.numpy.ones((8, 8)),), 2,
                           str(tmp_path / "trace"))
    assert os.path.isdir(tmp_path / "trace")


def test_mfu_accounting():
    """compiled_flops reads XLA's cost model; a 512^3 matmul is exactly
    2*512^3 FLOPs. On CPU peak is unknown -> mfu() returns None; with an
    injected peak the utilization math is checked directly."""
    import jax
    import jax.numpy as jnp

    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    f = jax.jit(lambda a, b: a @ b)
    x = jnp.ones((512, 512), jnp.float32)
    flops = mfu_lib.compiled_flops(f, x, x)
    if flops is not None:  # CPU backend exposes a cost model in this jax
        assert abs(flops - 2 * 512**3) / (2 * 512**3) < 0.01

    assert mfu_lib.peak_flops(jax.devices("cpu")[0]) is None
    assert mfu_lib.mfu(1e9, 10.0, jax.devices("cpu")[0]) is None
    # 1 GFLOP/call * 10 calls/s = 10 GFLOP/s; at a 100 GFLOP/s peak -> 0.1
    mfu_lib.PEAK_FLOPS_PER_CHIP["FakeChip"] = 100e9
    try:
        class _D:
            device_kind = "FakeChip"
        assert abs(mfu_lib.mfu(1e9, 10.0, _D()) - 0.1) < 1e-9
    finally:
        del mfu_lib.PEAK_FLOPS_PER_CHIP["FakeChip"]


def test_prefetch_propagates_worker_errors():
    """A crash in the prefetch worker must surface in the consumer, not
    leave q.get() blocked forever (code-review r2 finding)."""
    from recurrent_gaze_prediction_tpu.data.datasets import ClipDataset

    n, t = 4, 2
    data = ClipDataset(
        frames=np.zeros((n, t, 8, 8, 3), np.float32),
        gazemaps=np.zeros((n, t, 7, 7), np.float32),
        fixationmaps=np.zeros((n, t, 7, 7), np.float32),
        c3d=np.zeros((n, t, 4, 7, 7), np.float32),
        pupils=np.zeros((n, t), np.float32),
        clipnames=["c"] * n)
    # batch_size > dataset size trips next_batch's assertion in the worker
    it = prefetch_batches(data, 64, max_batches=3)
    with pytest.raises(AssertionError):
        next(it)


def test_clipdataset_reset_rewinds_cursor():
    """reset() makes checkpoint sweeps score every checkpoint on the
    same data window."""
    from recurrent_gaze_prediction_tpu.data.datasets import ClipDataset

    n, t = 6, 2
    data = ClipDataset(
        frames=np.arange(n, dtype=np.float32).reshape(n, 1, 1, 1, 1)
        * np.ones((n, t, 2, 2, 3), np.float32),
        gazemaps=np.zeros((n, t, 7, 7), np.float32),
        fixationmaps=np.zeros((n, t, 7, 7), np.float32),
        c3d=np.zeros((n, t, 4, 7, 7), np.float32),
        pupils=np.zeros((n, t), np.float32),
        clipnames=[str(i) for i in range(n)])
    first = data.next_batch(2)["clipnames"]
    data.next_batch(2)
    data.reset()
    again = data.next_batch(2)["clipnames"]
    assert first == again == ["0", "1"]


def test_config_override_bool_strings():
    """String "False" must coerce to False, not bool("False")==True
    (round-2 VERDICT: config.apply_overrides bool coercion)."""
    exp = ExperimentConfig()
    exp.apply_overrides({"optimizer.staircase": "False"})
    assert exp.optimizer.staircase is False
    exp.apply_overrides({"optimizer.staircase": "true"})
    assert exp.optimizer.staircase is True
    exp.apply_overrides({"model.use_flip_batch": "0"})
    assert exp.model.use_flip_batch is False
    exp.apply_overrides({"model.use_flip_batch": "yes"})
    assert exp.model.use_flip_batch is True
    with pytest.raises(ValueError):
        exp.apply_overrides({"optimizer.staircase": "maybe"})


def test_create_model_explicit_default_wins():
    """A field the user EXPLICITLY set to its dataclass default must not be
    clobbered by the per-model default (round-2 VERDICT: create_model
    default-merge sentinel)."""
    from recurrent_gaze_prediction_tpu.config import ModelConfig
    from recurrent_gaze_prediction_tpu.registry import create_model

    # dataclass default n_lstm_steps=42; gaze_rnn77's model default is 35
    cfg = ModelConfig()
    cfg.n_lstm_steps = 42  # explicit assignment to the default value
    model = create_model("gaze_rnn77", cfg)
    assert model.cfg.n_lstm_steps == 42

    # untouched config still receives the per-model default
    model2 = create_model("gaze_rnn77", ModelConfig())
    assert model2.cfg.n_lstm_steps == 35

    # dotted CLI overrides count as explicit too
    exp = ExperimentConfig()
    exp.apply_overrides({"model.batch_size": "7"})  # 7 == dataclass default
    model3 = create_model("gaze_framewise_shallownet", exp.model)
    assert model3.cfg.batch_size == 7  # model default is 5


def test_prefetch_abandoned_consumer_releases_worker():
    """Breaking out of prefetch_batches early (buffer_size=1) must let the
    worker thread exit — a bare q.put would block forever on the final
    sentinel, pinning the thread plus a device batch (round-3 review)."""
    import threading
    import time

    data = synthetic.make_clip_windows(6, 3, seed=0)
    before = {t.ident for t in threading.enumerate()}
    gen = prefetch_batches(data, 2, buffer_size=1)
    next(gen)
    gen.close()  # abandon: runs the generator's finally (stop + drain)
    deadline = time.time() + 5.0
    while time.time() < deadline:
        leaked = [t for t in threading.enumerate()
                  if t.ident not in before and t.is_alive()]
        if not leaked:
            break
        time.sleep(0.05)
    assert not leaked, f"prefetch worker leaked: {leaked}"


def test_scan_flops_correction_cpu_scan():
    """XLA's cost model counts a lax.scan body ONCE; compiled_flops_corrected
    adds the (trip_count - 1) x body dot/conv FLOPs back (VERDICT r3 item 5).
    A T=42 scan of one [8,128]x[128,128] matmul must come out within a few
    percent of the analytic 42 * 2*8*128^2 (elementwise ops add <1%)."""
    import jax
    import jax.numpy as jnp

    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    @jax.jit
    def f(x, w):
        def body(h, _):
            return jnp.tanh(h @ w), h
        _, ys = jax.lax.scan(body, x, None, length=42)
        return ys.sum()

    x = jnp.ones((8, 128))
    w = jnp.ones((128, 128))
    corrected, reported = mfu_lib.compiled_flops_corrected(f, x, w)
    if reported is None:
        pytest.skip("backend exposes no cost model")
    true_dot = 42 * 2 * 8 * 128 * 128
    assert reported < 0.1 * true_dot            # the undercount is real
    assert abs(corrected - true_dot) / true_dot < 0.05


def test_scan_flops_undercount_tpu_style_hlo():
    """The TPU backend records no known_trip_count backend_config; the trip
    count must come from the canonical `compare(i, constant(N)) LT` while
    condition, with layout annotations ({3,0:T(8,128)S(1)}) and
    /*index=N*/ comments in the way. Hand-written HLO in that style:
    one while, trip 42, body = a conv (2*[16,7,7,256]*3*3*128 = 2.89 GF)
    inside a fusion, so the undercount is 41 x body."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    hlo = """HloModule jit_step, entry_computation_layout={()->f32[]}

%fused_body.1 (p0: bf16[16,7,7,128], p1: bf16[3,3,128,256]) -> bf16[16,7,7,256] {
  %p0 = bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %p1 = bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %conv.1 = bf16[16,7,7,256]{3,0,2,1:T(8,128)(2,1)} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

%body.2 (tup: (s32[], bf16[16,7,7,128], bf16[3,3,128,256])) -> (s32[], bf16[16,7,7,128], bf16[3,3,128,256]) {
  %tup = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) parameter(0)
  %i = s32[]{:T(128)} get-tuple-element(%tup), index=0
  %h = bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)} get-tuple-element(%tup), index=1
  %w = bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)} get-tuple-element(%tup), index=2
  %f = bf16[16,7,7,256]{3,0,2,1:T(8,128)(2,1)} fusion(%h, %w), kind=kOutput, calls=%fused_body.1
  %one = s32[]{:T(128)} constant(1)
  %next = s32[]{:T(128)} add(%i, %one)
  ROOT %out = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) tuple(%next, %h, %w)
}

%cond.3 (tup.1: (s32[], bf16[16,7,7,128], bf16[3,3,128,256])) -> pred[] {
  %limit = s32[]{:T(128)} constant(42)
  %tup.1 = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) parameter(0)
  %iv = s32[]{:T(128)} get-tuple-element(%tup.1), index=0
  ROOT %lt = pred[]{:T(512)} compare(%iv, %limit), direction=LT
}

ENTRY %main.9 () -> f32[] {
  %init = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) tuple()
  %loop = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) while(%init), condition=%cond.3, body=%body.2
  ROOT %r = f32[] constant(0)
}
"""
    body_conv = 2 * (16 * 7 * 7 * 256) * (3 * 3 * 128)
    missing = mfu_lib.scan_flops_undercount(hlo)
    assert missing == 41 * body_conv


def test_while_trip_count_nonzero_induction_start():
    """fori_loop(start, N) bakes `start` into the while's init tuple; the
    trip count is N - start, not N — otherwise scan_flops_undercount
    inflates the 'corrected' MFU numerator and breaks its documented
    tight-lower-bound guarantee (round-4 review finding). Same canonical
    TPU-style HLO as above but init = tuple(constant(2), ...) and
    limit = 44: trip 42, undercount 41 x body."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    hlo = """HloModule jit_fori, entry_computation_layout={()->f32[]}

%fused_body.1 (p0: bf16[16,7,7,128], p1: bf16[3,3,128,256]) -> bf16[16,7,7,256] {
  %p0 = bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)} parameter(0)
  %p1 = bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)} parameter(1)
  ROOT %conv.1 = bf16[16,7,7,256]{3,0,2,1:T(8,128)(2,1)} convolution(%p0, %p1), window={size=3x3 pad=1_1x1_1}, dim_labels=b01f_01io->b01f
}

%body.2 (tup: (s32[], bf16[16,7,7,128], bf16[3,3,128,256])) -> (s32[], bf16[16,7,7,128], bf16[3,3,128,256]) {
  %tup = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) parameter(0)
  %i = s32[]{:T(128)} get-tuple-element(%tup), index=0
  %h = bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)} get-tuple-element(%tup), index=1
  %w = bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)} get-tuple-element(%tup), index=2
  %f = bf16[16,7,7,256]{3,0,2,1:T(8,128)(2,1)} fusion(%h, %w), kind=kOutput, calls=%fused_body.1
  %one = s32[]{:T(128)} constant(1)
  %next = s32[]{:T(128)} add(%i, %one)
  ROOT %out = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) tuple(%next, %h, %w)
}

%cond.3 (tup.1: (s32[], bf16[16,7,7,128], bf16[3,3,128,256])) -> pred[] {
  %limit = s32[]{:T(128)} constant(44)
  %tup.1 = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) parameter(0)
  %iv = s32[]{:T(128)} get-tuple-element(%tup.1), index=0
  ROOT %lt = pred[]{:T(512)} compare(%iv, %limit), direction=LT
}

ENTRY %main.9 () -> f32[] {
  %start = s32[]{:T(128)} constant(2)
  %h0 = bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)} constant(0)
  %w0 = bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)} constant(0)
  %init = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) tuple(%start, %h0, %w0)
  %loop = (s32[]{:T(128)}, bf16[16,7,7,128]{3,0,2,1:T(8,128)(2,1)}, /*index=2*/bf16[3,3,128,256]{3,2,1,0:T(8,128)(2,1)}) while(%init), condition=%cond.3, body=%body.2
  ROOT %r = f32[] constant(0)
}
"""
    body_conv = 2 * (16 * 7 * 7 * 256) * (3 * 3 * 128)
    missing = mfu_lib.scan_flops_undercount(hlo)
    assert missing == 41 * body_conv


def _while_hlo(cond_root: str, next_update: str, init_extra: str = "",
               init_elems: str = "tuple()") -> str:
    """Canonical single-while HLO (one [8,128]x[128,128] dot per trip)
    with a pluggable condition root and induction update — the template
    for the trip-count edge-case tests below."""
    return f"""HloModule jit_edge, entry_computation_layout={{()->f32[]}}

%body.2 (tup: (s32[], f32[8,128], f32[128,128])) -> (s32[], f32[8,128], f32[128,128]) {{
  %tup = (s32[], f32[8,128], /*index=2*/f32[128,128]) parameter(0)
  %i = s32[] get-tuple-element(%tup), index=0
  %h = f32[8,128] get-tuple-element(%tup), index=1
  %w = f32[128,128] get-tuple-element(%tup), index=2
  %d = f32[8,128] dot(%h, %w), lhs_contracting_dims={{1}}, rhs_contracting_dims={{0}}
  {next_update}
  ROOT %out = (s32[], f32[8,128], /*index=2*/f32[128,128]) tuple(%next, %d, %w)
}}

%cond.3 (tup.1: (s32[], f32[8,128], f32[128,128])) -> pred[] {{
  %limit = s32[] constant(84)
  %tup.1 = (s32[], f32[8,128], /*index=2*/f32[128,128]) parameter(0)
  %iv = s32[] get-tuple-element(%tup.1), index=0
  {cond_root}
}}

ENTRY %main.9 () -> f32[] {{
  {init_extra}
  %init = (s32[], f32[8,128], /*index=2*/f32[128,128]) {init_elems}
  %loop = (s32[], f32[8,128], /*index=2*/f32[128,128]) while(%init), condition=%cond.3, body=%body.2
  ROOT %r = f32[] constant(0)
}}
"""


_EDGE_BODY_DOT = 2 * 8 * 128 * 128


def test_while_trip_count_rejects_compound_condition():
    """A while whose condition is `(i < N) & (something dynamic)` has a
    DATA-DEPENDENT trip count; the canonical-pattern parser must not
    treat the embedded `compare LT` as a static trip count (it converges
    whenever the other conjunct flips), or corrected MFU overstates
    executed FLOPs (round-4 review finding). The compare is present but
    NOT the condition root -> no correction."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    cond = """%lt = pred[] compare(%iv, %limit), direction=LT
  %flag = pred[] constant(true)
  ROOT %and.1 = pred[] and(%lt, %flag)"""
    hlo = _while_hlo(cond, "%one = s32[] constant(1)\n  %next = s32[] add(%i, %one)")
    assert mfu_lib.scan_flops_undercount(hlo) == 0.0


def test_while_trip_count_strided_induction():
    """`i += 2` toward `i < 84` runs 42 trips, not 84: the stride is read
    from the body's `add(i, constant)` so the correction is
    ceil((N-start)/stride)-1 bodies, never N-1 (round-4 review finding)."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    cond = "ROOT %lt = pred[] compare(%iv, %limit), direction=LT"
    hlo = _while_hlo(cond, "%two = s32[] constant(2)\n  %next = s32[] add(%i, %two)")
    assert mfu_lib.scan_flops_undercount(hlo) == (42 - 1) * _EDGE_BODY_DOT


def test_while_trip_count_dynamic_stride_rejected():
    """An induction update `i += step` with a runtime `step` (here another
    tuple element) has no static trip count; the parser must bail rather
    than assume stride 1."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    cond = "ROOT %lt = pred[] compare(%iv, %limit), direction=LT"
    # the "increment" reads tuple element 0 plus a DOT-derived scalar: not canonical
    update = """%hsum = s32[] get-tuple-element(%tup), index=0
  %dyn = s32[] multiply(%hsum, %hsum)
  %next = s32[] add(%i, %dyn)"""
    hlo = _while_hlo(cond, update)
    assert mfu_lib.scan_flops_undercount(hlo) == 0.0


def test_while_trip_count_induction_init_scoped_to_enclosing_computation():
    """HLO instruction names are unique only per computation: a same-named
    `tuple` op in ANOTHER computation must not shadow the while's real
    init when resolving fori_loop's start value (round-4 review finding).
    Here a decoy computation defines %init = tuple(constant(80), ...);
    the real init in ENTRY starts at 2, so the trip count is 82 (not 4)."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    cond = "ROOT %lt = pred[] compare(%iv, %limit), direction=LT"
    update = "%one = s32[] constant(1)\n  %next = s32[] add(%i, %one)"
    init_extra = """%start = s32[] constant(2)
  %h0 = f32[8,128] constant(0)
  %w0 = f32[128,128] constant(0)"""
    hlo = _while_hlo(cond, update, init_extra, "tuple(%start, %h0, %w0)")
    decoy = """
%decoy.7 (p: s32[]) -> (s32[], f32[8,128], f32[128,128]) {
  %start = s32[] constant(80)
  %h0 = f32[8,128] constant(0)
  %w0 = f32[128,128] constant(0)
  ROOT %init = (s32[], f32[8,128], /*index=2*/f32[128,128]) tuple(%start, %h0, %w0)
}
"""
    # splice the decoy BEFORE ENTRY so later-parsed globals would win in a
    # cross-computation name map
    hlo = hlo.replace("ENTRY %main.9", decoy + "\nENTRY %main.9")
    assert mfu_lib.scan_flops_undercount(hlo) == (82 - 1) * _EDGE_BODY_DOT


def test_while_trip_count_zero_trip_contributes_nothing():
    """fori_loop(84, 84)-style zero-trip loops must not be coerced to one
    body of FLOPs by the nested-while weighting (round-4 review finding):
    trip 0 -> no correction and a nested weighting of 0."""
    from recurrent_gaze_prediction_tpu.utils import mfu as mfu_lib

    cond = "ROOT %lt = pred[] compare(%iv, %limit), direction=LT"
    update = "%one = s32[] constant(1)\n  %next = s32[] add(%i, %one)"
    init_extra = """%start = s32[] constant(84)
  %h0 = f32[8,128] constant(0)
  %w0 = f32[128,128] constant(0)"""
    hlo = _while_hlo(cond, update, init_extra, "tuple(%start, %h0, %w0)")
    assert mfu_lib.scan_flops_undercount(hlo) == 0.0
