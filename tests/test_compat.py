"""Checkpoint interop tests: TF checkpoint import + caffemodel parsing.

TF is an optional heavy dependency; these tests build a real TF1-style
checkpoint with the reference's variable names and verify the full forward
matches after import.
"""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

tf = pytest.importorskip("tensorflow")

from recurrent_gaze_prediction_tpu import registry
from recurrent_gaze_prediction_tpu.compat import (
    c3d_params_from_caffemodel,
    grcn_params_from_tf,
    load_tf_variables,
    parse_caffemodel,
    shallownet_params_from_tf,
    tf_deconv_kernel_to_jax,
    write_caffemodel,
)
from recurrent_gaze_prediction_tpu.models import c3d as c3d_model
from recurrent_gaze_prediction_tpu.models import shallownet
from recurrent_gaze_prediction_tpu.ops.layers import conv2d_transpose

# >60s on the virtual-CPU harness: deselected by default (pyproject addopts
# -m "not slow"); run everything with `pytest -m ""`.
pytestmark = pytest.mark.slow


def test_tf_deconv_kernel_conversion_matches_tf_op():
    """transpose+flip mapping == tf.nn.conv2d_transpose numerics."""
    rng = np.random.RandomState(0)
    x = rng.randn(1, 7, 7, 5).astype(np.float32)
    k_tf = rng.randn(5, 5, 3, 5).astype(np.float32)   # [h,w,out,in]
    expected = tf.nn.conv2d_transpose(
        x, k_tf, output_shape=[1, 23, 23, 3], strides=[1, 3, 3, 1],
        padding="VALID").numpy()
    ours = np.asarray(conv2d_transpose(
        jnp.array(x), jnp.array(tf_deconv_kernel_to_jax(k_tf)),
        stride=3, padding="VALID"))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


@pytest.fixture(scope="module")
def tf_checkpoint(tmp_path_factory):
    """A checkpoint with the reference's ShallowNet + GRCN variable names."""
    rng = np.random.RandomState(1)
    tmp = tmp_path_factory.mktemp("tfckpt")

    def v(name, shape):
        return tf.Variable(rng.randn(*shape).astype(np.float32) * 0.1,
                           name=name)

    variables = [
        v("ShallowNet/conv1/weights", (5, 5, 3, 32)),
        v("ShallowNet/conv1/biases", (32,)),
        v("ShallowNet/conv2/weights", (3, 3, 32, 64)),
        v("ShallowNet/conv2/biases", (64,)),
        v("ShallowNet/conv3/weights", (3, 3, 64, 32)),
        v("ShallowNet/conv3/biases", (32,)),
        v("ShallowNet/fc1/weights", (3872, 4802)),
        v("ShallowNet/fc1/biases", (4802,)),
        v("ShallowNet/fc2/weights", (2401, 4802)),
        v("ShallowNet/fc2/biases", (4802,)),
        # gaze_grcn (RGP scope)
        v("RGP/proj_c3d_W", (1024, 512)),
        v("RGP/proj_c3d_b", (512,)),
        v("RGP/RCNBottom/GRU_Conv_Wz", (3, 3, 512, 128)),
        v("RGP/RCNBottom/GRU_Conv_Uz", (3, 3, 128, 128)),
        v("RGP/RCNBottom/GRU_Conv_Wr", (3, 3, 512, 128)),
        v("RGP/RCNBottom/GRU_Conv_Ur", (3, 3, 128, 128)),
        v("RGP/RCNBottom/GRU_Conv_W", (3, 3, 512, 128)),
        v("RGP/RCNBottom/GRU_Conv_U", (3, 3, 128, 128)),
        v("RGP/Upsampling/weight1", (5, 5, 64, 128)),   # [h,w,out,in]
        v("RGP/Upsampling/weight2", (5, 5, 32, 64)),
        v("RGP/Upsampling/weight3", (7, 7, 12, 32)),
        v("RGP/out_W", (12, 1)),
        v("RGP/out_b", (1,)),
        v("RGP/batch_normalization/gamma", (128,)),
        v("RGP/batch_normalization/beta", (128,)),
        # slot vars that must be skipped
        v("RGP/out_W/Adam", (12, 1)),
        v("ShallowNet/conv1/weights/Adam_1", (5, 5, 3, 32)),
    ]
    ckpt = tf.train.Checkpoint(**{
        f"v{i}": var for i, var in enumerate(variables)})
    # use classic-style name-preserving saver via tf.compat.v1
    path = str(tmp / "ref_model")
    saver_vars = {var.name.split(":")[0]: var for var in variables}
    tf.compat.v1.train.Saver(var_list=saver_vars).save(None, path)
    return path


def test_shallownet_import_forward_parity(tf_checkpoint):
    variables = load_tf_variables(tf_checkpoint)
    assert not any("Adam" in n for n in variables)
    params = shallownet_params_from_tf(variables)
    params = {k: jnp.asarray(v) for k, v in params.items()}
    images = np.random.RandomState(2).rand(2, 98, 98, 3).astype(np.float32)
    out = shallownet.apply(params, jnp.asarray(images))
    assert out.shape == (2, 49, 49)
    assert np.isfinite(np.asarray(out)).all()
    # weights really came from the checkpoint
    np.testing.assert_array_equal(
        np.asarray(params["conv1_w"]),
        variables["ShallowNet/conv1/weights"])


def test_grcn_import_runs(tf_checkpoint):
    variables = load_tf_variables(tf_checkpoint)
    params = grcn_params_from_tf(variables)
    model = registry.create_model("gaze_grcn", n_lstm_steps=2, batch_size=1,
                                  compute_dtype="float32")
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    out = model.apply(jparams,
                      jnp.zeros((1, 2, 98, 98, 3)),
                      jnp.ones((1, 2, 1024, 7, 7)), train=False)
    assert out.shape == (1, 2, 49, 49)
    assert np.isfinite(np.asarray(out)).all()
    np.testing.assert_array_equal(
        params["cell"]["W_z"], variables["RGP/RCNBottom/GRU_Conv_Wz"])
    # deconv kernels converted (shape transposed to [h,w,in,out])
    assert params["decoder"]["up1_w"].shape == (5, 5, 128, 64)


def _fake_examples(n=3, seed=0):
    rng = np.random.RandomState(seed)
    return [{
        "/input/frame": rng.rand(98, 98, 3).astype(np.float32),
        "/input/c3d": rng.rand(1024, 7, 7).astype(np.float32),
        "/input/gazemaps_gt": rng.rand(49, 49).astype(np.float32),
        "/input/gazemaps_pred": rng.rand(49, 49).astype(np.float32),
        "/label/label": (rng.rand(13) > 0.8).astype(np.uint8),
    } for _ in range(n)]


def test_tfrecord_roundtrip_pure_python(tmp_path):
    from recurrent_gaze_prediction_tpu.compat import (
        read_reference_tfrecord,
        write_reference_tfrecord,
    )

    examples = _fake_examples()
    path = str(tmp_path / "train.tfrecord")
    write_reference_tfrecord(path, examples)
    back = read_reference_tfrecord(path)
    assert len(back) == 3
    for orig, parsed in zip(examples, back):
        for key in orig:
            np.testing.assert_array_equal(orig[key], parsed[key], err_msg=key)


def test_tfrecord_interop_with_real_tf(tmp_path):
    """Our writer -> tf.data reader, and tf.io writer -> our reader."""
    from recurrent_gaze_prediction_tpu.compat import (
        read_reference_tfrecord,
        write_reference_tfrecord,
    )

    examples = _fake_examples(2, seed=1)
    ours = str(tmp_path / "ours.tfrecord")
    write_reference_tfrecord(ours, examples)

    # TF reads our file (CRCs must be valid)
    ds = tf.data.TFRecordDataset([ours])
    parsed = []
    for record in ds:
        feats = tf.io.parse_single_example(record, {
            "/input/frame": tf.io.FixedLenFeature([], tf.string),
            "/label/label": tf.io.FixedLenFeature([], tf.string),
        })
        frame = np.frombuffer(feats["/input/frame"].numpy(),
                              np.float32).reshape(98, 98, 3)
        label = np.frombuffer(feats["/label/label"].numpy(), np.uint8)
        parsed.append((frame, label))
    assert len(parsed) == 2
    np.testing.assert_array_equal(parsed[0][0], examples[0]["/input/frame"])
    np.testing.assert_array_equal(parsed[1][1], examples[1]["/label/label"])

    # TF writes (reference-style) -> our reader parses
    theirs = str(tmp_path / "theirs.tfrecord")
    with tf.io.TFRecordWriter(theirs) as writer:
        for ex in examples:
            feature = {
                key: tf.train.Feature(bytes_list=tf.train.BytesList(
                    value=[np.ascontiguousarray(val).tobytes()]))
                for key, val in ex.items()
            }
            writer.write(tf.train.Example(features=tf.train.Features(
                feature=feature)).SerializeToString())
    back = read_reference_tfrecord(theirs)
    np.testing.assert_array_equal(back[0]["/input/c3d"],
                                  examples[0]["/input/c3d"])


def test_caffemodel_roundtrip_and_c3d_load(tmp_path):
    rng = np.random.RandomState(3)
    layers = {}
    in_ch = 3
    for name, out_ch in c3d_model.CONV_LAYERS:
        layers[name] = [rng.randn(out_ch, in_ch, 3, 3, 3).astype(np.float32),
                        rng.randn(1, 1, 1, 1, out_ch).astype(np.float32)]
        in_ch = out_ch
    for name, d_in, d_out in c3d_model.FC_LAYERS:
        layers[f"{name}-1"] = [
            rng.randn(d_out, d_in, 1, 1, 1).astype(np.float32),
            rng.randn(1, 1, 1, 1, d_out).astype(np.float32)]

    path = str(tmp_path / "sports1m.caffemodel")
    write_caffemodel(path, layers)

    parsed = parse_caffemodel(path)
    assert set(parsed) == set(layers)
    np.testing.assert_array_equal(parsed["conv1a"][0], layers["conv1a"][0])

    params = c3d_params_from_caffemodel(path)
    assert params["conv1a_w"].shape == (3, 3, 3, 3, 64)
    assert params["fc6_w"].shape == (8192, 4096)
    # run a forward with the ingested weights
    feats = c3d_model.apply(jax.tree_util.tree_map(jnp.asarray, params),
                            jnp.zeros((1, 16, 112, 112, 3)),
                            feature_layer="conv5b")
    assert feats.shape == (1, 2, 7, 7, 512)


# ------------------------------------------------- TF-anchored full goldens
#
# VERDICT r1: the NumPy golden networks were transcribed by the same author
# as the JAX forwards, so a shared misreading of TF semantics would pass.
# These rebuild the two load-bearing forward paths from raw tf.nn ops with
# SHARED weights and assert fp32 parity — an independent oracle.

def _tf_maxout2(x):
    """Reference maxout: max of the two halves of the last dim
    (`saliency_shallownet.py:157-158`)."""
    d = x.shape[-1] // 2
    return tf.maximum(x[..., :d], x[..., d:])


def test_tf_golden_shallownet_full_forward():
    """ShallowNet conv/pool/fc/maxout chain vs tf.nn ops
    (`saliency_shallownet.py:74-216`)."""
    import jax

    rng = np.random.RandomState(7)
    params = shallownet.init_params(jax.random.PRNGKey(3))
    images = rng.rand(4, 98, 98, 3).astype(np.float32)

    x = tf.constant(images)
    x = tf.nn.relu(tf.nn.conv2d(x, params["conv1_w"], 1, "VALID")
                   + params["conv1_b"])
    x = tf.nn.max_pool2d(x, 2, 2, "SAME")
    x = tf.nn.relu(tf.nn.conv2d(x, params["conv2_w"], 1, "VALID")
                   + params["conv2_b"])
    x = tf.nn.max_pool2d(x, 3, 2, "SAME")
    x = tf.nn.relu(tf.nn.conv2d(x, params["conv3_w"], 1, "VALID")
                   + params["conv3_b"])
    x = tf.nn.max_pool2d(x, 3, 2, "SAME")
    x = tf.reshape(x, (4, -1))
    x = tf.nn.relu(tf.matmul(x, params["fc1_w"]) + params["fc1_b"])
    x = _tf_maxout2(x)
    x = tf.nn.relu(tf.matmul(x, params["fc2_w"]) + params["fc2_b"])
    x = _tf_maxout2(x)
    expected = tf.reshape(x, (4, 49, 49)).numpy()

    ours = np.asarray(shallownet.apply(params, images))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-5)


def test_tf_golden_grcn_decoder_chain():
    """The GRCN 3-deconv decoder (BN -> 7->23->49 deconvs -> 12->1 head) vs
    tf.nn ops (`gaze_grcn.py:318-366`) — also validates the folded head
    against the UNfolded TF formulation."""
    import jax

    from recurrent_gaze_prediction_tpu.models.common import (
        apply_decoder,
        init_decoder,
    )

    rng = np.random.RandomState(8)
    params = init_decoder(jax.random.PRNGKey(4), in_channels=128)
    # non-trivial BN params so the frozen-BN semantics are actually checked
    params["bn_scale"] = jnp.asarray(
        1.0 + 0.1 * rng.randn(128).astype(np.float32))
    params["bn_offset"] = jnp.asarray(
        0.1 * rng.randn(128).astype(np.float32))
    x_in = rng.randn(6, 7, 7, 128).astype(np.float32)

    def jax_to_tf_deconv(k):  # HWIO (scattered flipped) -> TF [h,w,out,in]
        return np.asarray(k)[::-1, ::-1].transpose(0, 1, 3, 2)

    n = x_in.shape[0]
    eps = 1e-3
    x = tf.constant(x_in)
    # tf.layers.batch_normalization with untrained moving stats (mean 0,
    # var 1): y = scale * x / sqrt(1 + eps) + offset
    x = x * (params["bn_scale"] / np.sqrt(1.0 + eps)) + params["bn_offset"]
    x = tf.nn.conv2d_transpose(x, jax_to_tf_deconv(params["up1_w"]),
                               output_shape=[n, 23, 23, 64],
                               strides=[1, 3, 3, 1], padding="VALID")
    x = tf.nn.conv2d_transpose(x, jax_to_tf_deconv(params["up2_w"]),
                               output_shape=[n, 49, 49, 32],
                               strides=[1, 2, 2, 1], padding="VALID")
    x = tf.nn.conv2d_transpose(x, jax_to_tf_deconv(params["up3_w"]),
                               output_shape=[n, 49, 49, 12],
                               strides=[1, 1, 1, 1], padding="SAME")
    x = tf.matmul(tf.reshape(x, (-1, 12)), params["out_W"]) + params["out_b"]
    expected = tf.reshape(x, (n, 49, 49)).numpy()

    ours = np.asarray(apply_decoder(params, jnp.asarray(x_in),
                                    keep_prob=1.0, rng=None, train=False))
    np.testing.assert_allclose(ours, expected, rtol=1e-4, atol=1e-4)


# ------------------------------------------- caffemodel framing robustness

_CAFFE_PROTO_V1 = """
syntax = "proto2";
package cafv1;
message BlobProto {
  optional int32 num = 1; optional int32 channels = 2;
  optional int32 length = 3; optional int32 height = 4;
  optional int32 width = 5;
  repeated float data = 6 [packed = true];
}
message V1LayerParameter {
  repeated string bottom = 2;
  repeated string top = 3;
  optional string name = 4;
  repeated BlobProto blobs = 6;
}
message NetParameter {
  optional string name = 1;
  repeated V1LayerParameter layers = 2;
}
"""

_CAFFE_PROTO_MODERN = """
syntax = "proto2";
package cafmod;
message BlobShape { repeated int64 dim = 1 [packed = true]; }
message BlobProto {
  optional BlobShape shape = 7;
  repeated float data = 5 [packed = true];
  optional int32 num = 1; optional int32 channels = 2;
  optional int32 height = 3; optional int32 width = 4;
}
message LayerParameter {
  optional string name = 1;
  repeated BlobProto blobs = 7;
}
message NetParameter {
  optional string name = 1;
  repeated LayerParameter layer = 100;
}
"""

_CAFFE_PROTO_V0 = """
syntax = "proto2";
package cafv0;
message BlobProto {
  optional int32 num = 1; optional int32 channels = 2;
  optional int32 height = 3; optional int32 width = 4;
  repeated float data = 6 [packed = true];
}
message V0LayerParameter {
  optional string name = 1;
  optional string type = 2;
  repeated BlobProto blobs = 50;
}
message LayerConnection {
  optional V0LayerParameter layer = 1;
  repeated string bottom = 2;
  repeated string top = 3;
}
message NetParameter {
  optional string name = 1;
  repeated LayerConnection layers = 2;
}
"""


def _compile_proto(tmp_path, name, text):
    import importlib
    import shutil
    import subprocess
    import sys

    if shutil.which("protoc") is None:
        pytest.skip("protoc not available")
    proto = tmp_path / f"{name}.proto"
    proto.write_text(text)
    subprocess.run(["protoc", f"--python_out={tmp_path}", f"{name}.proto"],
                   cwd=tmp_path, check=True)
    sys.path.insert(0, str(tmp_path))
    try:
        return importlib.import_module(f"{name}_pb2")
    finally:
        sys.path.remove(str(tmp_path))


def test_caffemodel_v1_framing_real_schema(tmp_path):
    """Fixture emitted by the ACTUAL V1 protobuf schema (the C3D fork's
    framing), not the homegrown writer (VERDICT r1 item 5)."""
    pb = _compile_proto(tmp_path, "cafv1", _CAFFE_PROTO_V1)
    rng = np.random.RandomState(0)
    w = rng.randn(4, 3, 3, 3, 3).astype(np.float32)
    b = rng.randn(4).astype(np.float32)

    net = pb.NetParameter(name="DeepConv3DNet")
    layer = net.layers.add(name="conv1a")
    layer.bottom.append("data")
    layer.top.append("conv1a")
    for arr, dims in ((w, w.shape), (b, (4, 1, 1, 1, 1))):
        blob = layer.blobs.add()
        blob.num, blob.channels, blob.length, blob.height, blob.width = dims
        blob.data.extend(arr.reshape(-1).tolist())
    path = str(tmp_path / "v1.caffemodel")
    open(path, "wb").write(net.SerializeToString())

    layers = parse_caffemodel(path)
    assert set(layers) == {"conv1a"}
    np.testing.assert_array_equal(layers["conv1a"][0], w)
    np.testing.assert_array_equal(layers["conv1a"][1].reshape(-1), b)


def test_caffemodel_modern_framing_real_schema(tmp_path):
    """Modern caffe-1.0 framing: layer=100, blobs=7, packed data=5, shape
    submessage (serialized with data BEFORE shape, the common field order)."""
    pb = _compile_proto(tmp_path, "cafmod", _CAFFE_PROTO_MODERN)
    rng = np.random.RandomState(1)
    w = rng.randn(6, 2, 5, 5).astype(np.float32)

    net = pb.NetParameter(name="modern")
    layer = net.layer.add(name="convA")
    blob = layer.blobs.add()
    blob.data.extend(w.reshape(-1).tolist())
    blob.shape.dim.extend(w.shape)
    blob2 = layer.blobs.add()          # legacy 4-D dims, no shape message
    blob2.num, blob2.channels, blob2.height, blob2.width = 1, 6, 1, 1
    blob2.data.extend(np.arange(6, dtype=np.float32).tolist())
    path = str(tmp_path / "modern.caffemodel")
    open(path, "wb").write(net.SerializeToString())

    layers = parse_caffemodel(path)
    np.testing.assert_array_equal(layers["convA"][0], w)
    assert layers["convA"][1].shape == (1, 6, 1, 1)  # 4-D legacy dims


def test_caffemodel_v0_framing_real_schema(tmp_path):
    """Oldest framing: layers=2 { layer=1 { name=1, blobs=50 } }."""
    pb = _compile_proto(tmp_path, "cafv0", _CAFFE_PROTO_V0)
    rng = np.random.RandomState(2)
    w = rng.randn(2, 3, 4, 4).astype(np.float32)

    net = pb.NetParameter(name="old")
    conn = net.layers.add()
    conn.layer.name = "conv_old"
    conn.layer.type = "conv"
    blob = conn.layer.blobs.add()
    blob.num, blob.channels, blob.height, blob.width = w.shape
    blob.data.extend(w.reshape(-1).tolist())
    path = str(tmp_path / "v0.caffemodel")
    open(path, "wb").write(net.SerializeToString())

    layers = parse_caffemodel(path)
    np.testing.assert_array_equal(layers["conv_old"][0], w)


# ---------------------------------------------------------------------------
# TF-anchored recurrence goldens (round-3): the ConvGRU / ConvLSTM / FlatGRU
# gate wiring pinned against raw tf.nn.conv2d / tf.matmul / sigmoid / tanh
# graphs — TF's ops AND TF's autodiff are an independent implementation
# stack, so this breaks the same-author loop of the NumPy goldens
# (tests/test_cells.py). Equations from `/root/reference/models/
# gaze_grcn.py:108-146` and `models/gaze_lstm.py:103-133`.
# ---------------------------------------------------------------------------


def _tf_convgru_states(np_params, xs, t_steps):
    """Reference ConvGRU unrolled with raw TF ops (gaze_grcn.py:108-146):
    u = sig(conv(x,W_z)+conv(h,U_z)); r = sig(conv(x,W_r)+conv(h,U_r));
    c = tanh(conv(x,W)+conv(r*h,U)); h' = u*h + (1-u)*c."""
    tfp = {k: tf.Variable(v) for k, v in np_params.items()}

    def c2d(a, k):
        return tf.nn.conv2d(a, tfp[k], [1, 1, 1, 1], padding="SAME")

    with tf.GradientTape() as tape:
        h = tf.zeros_like(xs[0, ..., :1]) * 0.0
        h = tf.zeros(xs.shape[1:2] + xs.shape[2:4] + (np_params["U"].shape[-1],),
                     tf.float32)
        states = []
        for i in range(t_steps):
            x = xs[i]
            u = tf.sigmoid(c2d(x, "W_z") + c2d(h, "U_z"))
            r = tf.sigmoid(c2d(x, "W_r") + c2d(h, "U_r"))
            cand = tf.tanh(c2d(x, "W") + c2d(r * h, "U"))
            h = u * h + (1.0 - u) * cand
            states.append(h)
        loss = tf.reduce_sum(tf.stack(states) ** 2)
    grads = tape.gradient(loss, tfp)
    return ([s.numpy() for s in states],
            {k: g.numpy() for k, g in grads.items()})


def test_tf_golden_convgru_states_and_grads():
    """Per-step hidden states over T=6 AND dL/dW for all six cell kernels
    must match the TF graph at fp32 (<=1e-5)."""
    from recurrent_gaze_prediction_tpu.ops.cells import ConvGRU
    from recurrent_gaze_prediction_tpu.ops.pallas.convgru import convgru_scan

    rng = np.random.RandomState(11)
    t, b, h, w, cdim, units = 6, 2, 7, 7, 12, 8
    shapes = ConvGRU.init(jax.random.PRNGKey(0), cdim, units)
    np_params = {k: rng.randn(*v.shape).astype(np.float32) * 0.3
                 for k, v in shapes.items()}
    xs = rng.randn(t, b, h, w, cdim).astype(np.float32)

    tf_states, tf_grads = _tf_convgru_states(np_params, tf.constant(xs), t)

    jparams = {k: jnp.array(v) for k, v in np_params.items()}
    jxs = jnp.array(xs)
    h0 = ConvGRU.zero_state(b, (h, w), units)

    _, ys = ConvGRU.scan(jparams, jxs, h0)
    ys = np.asarray(ys)
    for i in range(t):
        np.testing.assert_allclose(
            ys[i], tf_states[i], rtol=1e-5, atol=1e-6,
            err_msg=f"ConvGRU state step {i}")

    # gradient parity: TF GradientTape vs jax.grad through lax.scan
    def loss_fn(p):
        _, out = ConvGRU.scan(p, jxs, h0)
        return jnp.sum(out ** 2)

    # grads accumulate conv reductions in different orders (TF's conv
    # backward vs XLA's); observed fp32 noise is ~1e-4 relative on <1%% of
    # elements, so the gradient anchor is 2e-4 while STATES stay at 1e-5
    jgrads = jax.grad(loss_fn)(jparams)
    for k in np_params:
        np.testing.assert_allclose(
            np.asarray(jgrads[k]), tf_grads[k], rtol=2e-4, atol=2e-5,
            err_msg=f"ConvGRU dL/d{k}")

    # the Pallas inference kernel reproduces the same TF-anchored states
    _, pl_ys = convgru_scan(jparams, jxs, h0, compute_dtype=jnp.float32,
                            interpret=True)
    np.testing.assert_allclose(np.asarray(pl_ys), np.stack(tf_states),
                               rtol=1e-4, atol=1e-5,
                               err_msg="Pallas ConvGRU vs TF")

    # the trainable Pallas VJP path matches TF gradients too
    from recurrent_gaze_prediction_tpu.ops.pallas.convgru_vjp import (
        convgru_scan_trainable,
    )

    def loss_pl(p):
        _, out = convgru_scan_trainable(p, jxs, h0,
                                        compute_dtype=jnp.float32,
                                        interpret=True)
        return jnp.sum(out ** 2)

    pl_grads = jax.grad(loss_pl)(jparams)
    for k in np_params:
        np.testing.assert_allclose(
            np.asarray(pl_grads[k]), tf_grads[k], rtol=1e-4, atol=1e-4,
            err_msg=f"Pallas-VJP ConvGRU dL/d{k}")


def _tf_convlstm_states(np_params, xs, t_steps):
    """Intended peephole ConvLSTM with raw TF ops (gaze_lstm.py:103-133;
    candidate uses W_hc — the reference's own graph convolves W_hi there,
    a documented latent bug, `ops/cells.py:12-19`). Output gate peeps at
    the OLD cell state exactly like the reference."""
    tfp = {k: tf.Variable(v) for k, v in np_params.items()}

    def c2d(a, k):
        return tf.nn.conv2d(a, tfp[k], [1, 1, 1, 1], padding="SAME")

    units = np_params["W_ci"].shape[-1]
    with tf.GradientTape() as tape:
        shape = (xs.shape[1], xs.shape[2], xs.shape[3], units)
        c = tf.zeros(shape, tf.float32)
        h = tf.zeros(shape, tf.float32)
        states = []
        for s in range(t_steps):
            x = xs[s]
            i = tf.sigmoid(c2d(x, "W_xi") + c2d(h, "W_hi") + tfp["W_ci"] * c)
            f = tf.sigmoid(c2d(x, "W_xf") + c2d(h, "W_hf") + tfp["W_cf"] * c)
            new_c = f * c + i * tf.tanh(c2d(x, "W_xc") + c2d(h, "W_hc"))
            o = tf.sigmoid(c2d(x, "W_xo") + c2d(h, "W_ho") + tfp["W_co"] * c)
            c, h = new_c, tf.tanh(new_c) * o
            states.append(h)
        loss = tf.reduce_sum(tf.stack(states) ** 2)
    grads = tape.gradient(loss, tfp)
    return ([s.numpy() for s in states],
            {k: g.numpy() for k, g in grads.items()})


def test_tf_golden_convlstm_states_and_grads():
    """Per-step h over T=5 and dL/dW for all 11 ConvLSTM weights vs TF."""
    from recurrent_gaze_prediction_tpu.ops.cells import ConvLSTM
    from recurrent_gaze_prediction_tpu.ops.pallas.convlstm import convlstm_scan

    rng = np.random.RandomState(13)
    t, b, h, w, cdim, units = 5, 2, 7, 7, 6, 4
    shapes = ConvLSTM.init(jax.random.PRNGKey(0), cdim, units, (h, w))
    np_params = {k: rng.randn(*v.shape).astype(np.float32) * 0.2
                 for k, v in shapes.items()}
    xs = rng.randn(t, b, h, w, cdim).astype(np.float32)

    tf_states, tf_grads = _tf_convlstm_states(np_params, tf.constant(xs), t)

    jparams = {k: jnp.array(v) for k, v in np_params.items()}
    jxs = jnp.array(xs)
    carry0 = ConvLSTM.zero_state(b, (h, w), units)

    _, ys = ConvLSTM.scan(jparams, jxs, carry0)
    ys = np.asarray(ys)
    for i in range(t):
        np.testing.assert_allclose(
            ys[i], tf_states[i], rtol=1e-5, atol=1e-6,
            err_msg=f"ConvLSTM state step {i}")

    def loss_fn(p):
        _, out = ConvLSTM.scan(p, jxs, carry0)
        return jnp.sum(out ** 2)

    jgrads = jax.grad(loss_fn)(jparams)
    for k in np_params:
        np.testing.assert_allclose(
            np.asarray(jgrads[k]), tf_grads[k], rtol=2e-4, atol=2e-5,
            err_msg=f"ConvLSTM dL/d{k}")

    _, pl_ys = convlstm_scan(jparams, jxs, carry0, compute_dtype=jnp.float32,
                             interpret=True)
    np.testing.assert_allclose(np.asarray(pl_ys), np.stack(tf_states),
                               rtol=1e-4, atol=1e-5,
                               err_msg="Pallas ConvLSTM vs TF")


def test_tf_golden_flatgru_states_and_grads():
    """Flat GRU (TF1 `tf.nn.rnn_cell.GRUCell` semantics, gaze_rnn.py:315):
    [r,u]=sig([x,h]@Wg+bg(init 1)); c=tanh([x,r*h]@Wc+bc); h'=u*h+(1-u)*c,
    rebuilt with raw tf.matmul and anchored at fp32 states + grads."""
    from recurrent_gaze_prediction_tpu.ops.cells import FlatGRU

    rng = np.random.RandomState(17)
    t, b, d, units = 6, 3, 10, 8
    np_params = {
        "gates_kernel": rng.randn(d + units, 2 * units).astype(np.float32) * 0.3,
        "gates_bias": np.ones((2 * units,), np.float32),
        "candidate_kernel": rng.randn(d + units, units).astype(np.float32) * 0.3,
        "candidate_bias": np.zeros((units,), np.float32),
    }
    xs = rng.randn(t, b, d).astype(np.float32)

    tfp = {k: tf.Variable(v) for k, v in np_params.items()}
    with tf.GradientTape() as tape:
        h = tf.zeros((b, units), tf.float32)
        states = []
        for i in range(t):
            x = tf.constant(xs[i])
            gates = tf.sigmoid(
                tf.matmul(tf.concat([x, h], 1), tfp["gates_kernel"])
                + tfp["gates_bias"])
            r, u = tf.split(gates, 2, axis=1)
            c = tf.tanh(
                tf.matmul(tf.concat([x, r * h], 1), tfp["candidate_kernel"])
                + tfp["candidate_bias"])
            h = u * h + (1.0 - u) * c
            states.append(h)
        loss = tf.reduce_sum(tf.stack(states) ** 2)
    tf_grads = {k: g.numpy() for k, g in tape.gradient(loss, tfp).items()}
    tf_states = [s.numpy() for s in states]

    jparams = {k: jnp.array(v) for k, v in np_params.items()}
    jxs = jnp.array(xs)
    h0 = FlatGRU.zero_state(b, units)

    _, ys = FlatGRU.scan(jparams, jxs, h0)
    ys = np.asarray(ys)
    for i in range(t):
        np.testing.assert_allclose(
            ys[i], tf_states[i], rtol=1e-5, atol=1e-6,
            err_msg=f"FlatGRU state step {i}")

    def loss_fn(p):
        _, out = FlatGRU.scan(p, jxs, h0)
        return jnp.sum(out ** 2)

    jgrads = jax.grad(loss_fn)(jparams)
    for k in np_params:
        np.testing.assert_allclose(
            np.asarray(jgrads[k]), tf_grads[k], rtol=1e-5, atol=1e-5,
            err_msg=f"FlatGRU dL/d{k}")


def test_tfrecord_truncated_file_raises_ioerror(tmp_path):
    """A file cut off mid-payload raises the module's own IOError, not a
    bare struct.error — and verify_crc=False must not yield the short
    corrupt payload (round-3 review)."""
    from recurrent_gaze_prediction_tpu.compat import tfrecord

    path = str(tmp_path / "t.tfrecord")
    tfrecord.write_tfrecords(path, [b"x" * 100, b"y" * 100])
    blob = open(path, "rb").read()
    open(path, "wb").write(blob[:len(blob) - 50])  # cut mid-payload
    records = []
    with pytest.raises(IOError, match="truncated|corrupt"):
        for rec in tfrecord.iter_tfrecords(path):
            records.append(rec)
    assert records == [b"x" * 100]
    with pytest.raises(IOError, match="truncated"):
        list(tfrecord.iter_tfrecords(path, verify_crc=False))


def test_tfrecord_truncated_mid_header_raises_ioerror(tmp_path):
    """A file cut off 1-11 bytes INTO a record header must raise like the
    mid-payload case, not silently pass as clean EOF (round-4 review:
    an interrupted copy yielded an incomplete dataset as success)."""
    from recurrent_gaze_prediction_tpu.compat import tfrecord

    path = str(tmp_path / "t.tfrecord")
    tfrecord.write_tfrecords(path, [b"x" * 100, b"y" * 100])
    blob = open(path, "rb").read()
    # keep record 1 fully + 6 bytes of record 2's 12-byte header
    cut = 12 + 100 + 4 + 6
    open(path, "wb").write(blob[:cut])
    records = []
    with pytest.raises(IOError, match="header"):
        for rec in tfrecord.iter_tfrecords(path):
            records.append(rec)
    assert records == [b"x" * 100]


def test_caffemodel_blob_data_split_across_chunks():
    """The proto wire format allows packed repeated data split into
    several length-delimited chunks; the parser must concatenate them
    (round-3 review: later chunks overwrote earlier ones)."""
    from recurrent_gaze_prediction_tpu.compat import caffemodel as cm

    vals = np.arange(24, dtype="<f4")
    # V1-era blob: dims num=1 ch=2 len=3 h=2 w=2 as varint fields 1..5,
    # data field 6 split into two packed chunks
    def varint_field(field, value):
        return bytes([(field << 3) | 0, value])

    def chunk_field(field, payload):
        assert len(payload) < 128
        return bytes([(field << 3) | 2, len(payload)]) + payload

    buf = (varint_field(1, 1) + varint_field(2, 2) + varint_field(3, 3) +
           varint_field(4, 2) + varint_field(5, 2) +
           chunk_field(6, vals[:10].tobytes()) +
           chunk_field(6, vals[10:].tobytes()))
    arr = cm._parse_blob(memoryview(buf), legacy_4d=False)
    assert arr.shape == (1, 2, 3, 2, 2)
    np.testing.assert_array_equal(arr.ravel(), vals)


def test_caffemodel_blob_with_c3d_era_diff_field():
    """A C3D-era snapshot written with diffs puts packed FLOATS at field 7
    (the modern schema's `shape` slot); the parser must not interpret
    them as BlobShape dims (round-4 review: that crashed the reshape or
    corrupted shapes) — weights parse from field 6, diff ignored."""
    from recurrent_gaze_prediction_tpu.compat import caffemodel as cm

    vals = np.arange(24, dtype="<f4")
    diff = np.full(24, 0.5, dtype="<f4")

    def varint_field(field, value):
        return bytes([(field << 3) | 0, value])

    def chunk_field(field, payload):
        assert len(payload) < 128
        return bytes([(field << 3) | 2, len(payload)]) + payload

    buf = (varint_field(1, 1) + varint_field(2, 2) + varint_field(3, 3) +
           varint_field(4, 2) + varint_field(5, 2) +
           chunk_field(6, vals.tobytes()) +
           chunk_field(7, diff.tobytes()))
    arr = cm._parse_blob(memoryview(buf), legacy_4d=False)
    assert arr.shape == (1, 2, 3, 2, 2)
    np.testing.assert_array_equal(arr.ravel(), vals)


def test_caffemodel_blob_modern_with_diff_field():
    """Modern caffe: data=5, diff=6, shape=7. A blob saved with diffs must
    resolve `data` from field 5 via the shape product (round-4 review:
    fields 5 and 6 were concatenated, doubling the payload and leaving
    the blob flat)."""
    from recurrent_gaze_prediction_tpu.compat import caffemodel as cm

    vals = np.arange(24, dtype="<f4")
    diff = np.full(24, 0.25, dtype="<f4")

    def chunk_field(field, payload):
        assert len(payload) < 128
        return bytes([(field << 3) | 2, len(payload)]) + payload

    # BlobShape { dim=1 packed varints [2, 3, 4] }
    shape_msg = bytes([(1 << 3) | 2, 3, 2, 3, 4])
    buf = (chunk_field(5, vals.tobytes()) +
           chunk_field(6, diff.tobytes()) +
           chunk_field(7, shape_msg))
    arr = cm._parse_blob(memoryview(buf), legacy_4d=True)
    assert arr.shape == (2, 3, 4)
    np.testing.assert_array_equal(arr.ravel(), vals)


# ---------------------------------------------------------------------------
# TF-anchored WHOLE-NETWORK goldens (round 4): the components above are each
# pinned against TF, but composition bugs live in the seams (dtype
# boundaries, BN placement, loss reduction). These rebuild the reference's
# COMPLETE `create_gazeprediction_network` graphs from raw tf.nn ops with
# shared weights and pin (a) the fp32 forward maps, (b) the xentropy loss,
# and (c) dL/dtheta for EVERY parameter — through the linearized decoder
# (B*T >= 32 so `apply_decoder` takes the composed-matmul path).
# Graph: `/root/reference/models/gaze_grcn.py:174-376`; loss:
# `/root/reference/models/gaze_rnn.py:363-408`.
# ---------------------------------------------------------------------------


def _jax_to_tf_deconv(k):
    """HWIO (lax scatter-flipped) -> TF conv2d_transpose [h, w, out, in]."""
    return np.asarray(k)[::-1, ::-1].transpose(0, 1, 3, 2)


def _tf_from_jax_deconv_grad(g):
    """Map dL/dk_tf back to dL/dk_jax (the layout map is its own inverse
    transform: flip spatial, swap the last two axes)."""
    return np.asarray(g)[::-1, ::-1].transpose(0, 1, 3, 2)


def _scaled_like(tree, rng, scale_fn):
    """Replace every leaf with randn scaled per-leaf (fan-in aware), so
    recurrent gates stay in their responsive range instead of saturating
    (saturated gates would make gradient parity trivially true)."""
    import jax

    def leaf(x):
        shape = np.shape(x)
        return (rng.randn(*shape) * scale_fn(shape)).astype(np.float32)

    return jax.tree_util.tree_map(leaf, tree)


def _default_scale(shape):
    if len(shape) <= 1:
        return 0.1
    fan_in = float(np.prod(shape[:-1]))
    return 1.0 / np.sqrt(fan_in)


def _build_tf_grcn_graph(tfp, c3d, gt_norm, b, t):
    """The full reference gaze_grcn network + xentropy loss in raw TF2 ops.

    Mirrors `create_gazeprediction_network` (gaze_grcn.py:174-376) with
    dropout off: c3d transpose -> 1024->512 projection -> ConvGRU over T
    -> per-frame frozen BN -> 3 deconvs -> 12->1 head -> [B,T,49,49];
    then sum_t softmax-xent / (B*T) (gaze_rnn.py:381-407).
    """
    def c2d(a, k):
        return tf.nn.conv2d(a, tfp[k], [1, 1, 1, 1], padding="SAME")

    units = int(tfp["U"].shape[-1])
    # projection (gaze_grcn.py:234-254)
    x = tf.transpose(c3d, perm=[0, 1, 3, 4, 2])
    flat = tf.reshape(x, [-1, int(tfp["proj_c3d_W"].shape[0])])
    emb = tf.matmul(flat, tfp["proj_c3d_W"]) + tfp["proj_c3d_b"]
    emb = tf.reshape(emb, [b, t, 7, 7, int(tfp["proj_c3d_W"].shape[1])])

    # ConvGRU over T (gaze_grcn.py:259-288; cell eqs :108-146)
    h = tf.zeros((b, 7, 7, units), tf.float32)
    rcn_outputs = []
    for i in range(t):
        xi = emb[:, i]
        u = tf.sigmoid(c2d(xi, "W_z") + c2d(h, "U_z"))
        r = tf.sigmoid(c2d(xi, "W_r") + c2d(h, "U_r"))
        cand = tf.tanh(c2d(xi, "W") + c2d(r * h, "U"))
        h = u * h + (1.0 - u) * cand
        rcn_outputs.append(h)

    return _tf_decode_and_xent(tfp, rcn_outputs, gt_norm, b, t, units)


def _tf_decode_and_xent(tfp, rcn_outputs, gt_norm, b, t, units):
    """Shared reference decoder + loss oracle: per-frame frozen BN ->
    3 deconvs -> 12->1 head (gaze_grcn.py:316-366 == gaze_lstm.py:291-345),
    then sum_t softmax-xent over the flattened 2401 grid / (B*T)
    (gaze_rnn.py:381-407)."""
    zeros = tf.zeros((units,), tf.float32)
    ones = tf.ones((units,), tf.float32)
    maps = []
    for i in range(t):
        y = tf.nn.batch_normalization(
            rcn_outputs[i], zeros, ones, tfp["bn_offset"], tfp["bn_scale"],
            variance_epsilon=1e-3)  # tf.layers.batch_normalization, untrained
        y = tf.nn.conv2d_transpose(y, tfp["up1_tf"],
                                   output_shape=[b, 23, 23, 64],
                                   strides=[1, 3, 3, 1], padding="VALID")
        y = tf.nn.conv2d_transpose(y, tfp["up2_tf"],
                                   output_shape=[b, 49, 49, 32],
                                   strides=[1, 2, 2, 1], padding="VALID")
        y = tf.nn.conv2d_transpose(y, tfp["up3_tf"],
                                   output_shape=[b, 49, 49, 12],
                                   strides=[1, 1, 1, 1], padding="SAME")
        y = tf.matmul(tf.reshape(y, [-1, 12]), tfp["out_W"]) + tfp["out_b"]
        maps.append(tf.reshape(y, [b, 49, 49]))
    pred = tf.transpose(tf.stack(maps), [1, 0, 2, 3])  # [B,T,49,49]

    loss = 0.0
    for i in range(t):
        logits_flat = tf.reshape(pred[:, i], [b, -1])
        labels_flat = tf.reshape(gt_norm[:, i], [b, -1])
        xloss = tf.nn.softmax_cross_entropy_with_logits(
            logits=logits_flat, labels=labels_flat)
        loss += tf.reduce_sum(xloss)
    loss = loss / float(b * t)
    return pred, loss


def _build_tf_lstm_graph(tfp, c3d, gt_norm, b, t):
    """The full reference gaze_lstm network + xentropy loss in raw TF2 ops.

    Mirrors `create_gazeprediction_network` (gaze_lstm.py:174-355) with
    dropout off: c3d transpose -> 1024->512 projection -> peephole
    ConvLSTM over T (cell eqs gaze_lstm.py:103-133; candidate intended
    W_hc, the reference's W_hi reuse being a documented latent bug,
    `ops/cells.py:12-19`) -> the same frozen-BN 3-deconv decoder and
    summed softmax-xent / (B*T) as gaze_grcn.
    """
    def c2d(a, k):
        return tf.nn.conv2d(a, tfp[k], [1, 1, 1, 1], padding="SAME")

    units = int(tfp["W_ci"].shape[-1])
    x = tf.transpose(c3d, perm=[0, 1, 3, 4, 2])
    flat = tf.reshape(x, [-1, int(tfp["proj_c3d_W"].shape[0])])
    emb = tf.matmul(flat, tfp["proj_c3d_W"]) + tfp["proj_c3d_b"]
    emb = tf.reshape(emb, [b, t, 7, 7, int(tfp["proj_c3d_W"].shape[1])])

    c = tf.zeros((b, 7, 7, units), tf.float32)
    h = tf.zeros((b, 7, 7, units), tf.float32)
    rcn_outputs = []
    for s in range(t):
        xi = emb[:, s]
        i = tf.sigmoid(c2d(xi, "W_xi") + c2d(h, "W_hi") + tfp["W_ci"] * c)
        f = tf.sigmoid(c2d(xi, "W_xf") + c2d(h, "W_hf") + tfp["W_cf"] * c)
        new_c = f * c + i * tf.tanh(c2d(xi, "W_xc") + c2d(h, "W_hc"))
        o = tf.sigmoid(c2d(xi, "W_xo") + c2d(h, "W_ho") + tfp["W_co"] * c)
        c, h = new_c, tf.tanh(new_c) * o
        rcn_outputs.append(h)

    return _tf_decode_and_xent(tfp, rcn_outputs, gt_norm, b, t, units)


def test_tf_golden_grcn_whole_network_forward_loss_and_grads():
    """The composed gaze_grcn network end to end vs raw TF2 ops at the
    REFERENCE dims (1024->512 proj, 128-unit ConvGRU): forward maps at
    fp32 <=1e-5 (rtol), loss exact to fp32 noise, and dL/dtheta for every
    one of the 15 parameters <=2e-4 — through the linearized decoder
    (B*T = 32 >= _COMPOSE_MIN_N, so the composed-matmul path is the one
    under test; its stagewise anchor is test_tf_golden_grcn_decoder_chain).
    """
    from recurrent_gaze_prediction_tpu.models.common import _COMPOSE_MIN_N

    b, t = 4, 8
    assert b * t >= _COMPOSE_MIN_N  # the linearized path must engage

    model = registry.create_model("gaze_grcn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="float32")
    rng = np.random.RandomState(23)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)
    params["decoder"]["bn_scale"] = (
        1.0 + 0.1 * rng.randn(128)).astype(np.float32)
    params["decoder"]["bn_offset"] = (
        0.1 * rng.randn(128)).astype(np.float32)

    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)  # unused by gaze_grcn
    gt = (rng.rand(b, t, 49, 49).astype(np.float32) + 0.01)
    gt_norm = gt / gt.sum(axis=(-2, -1), keepdims=True)

    # ---- TF oracle (tracks every parameter for gradients)
    tfp = {}
    for k, v in params["c3d_proj"].items():
        tfp[k] = tf.Variable(v)
    for k, v in params["cell"].items():
        tfp[k] = tf.Variable(v)
    dec = params["decoder"]
    for k in ("out_W", "out_b", "bn_scale", "bn_offset"):
        tfp[k] = tf.Variable(np.asarray(dec[k]))
    for i, k in enumerate(("up1_w", "up2_w", "up3_w"), start=1):
        tfp[f"up{i}_tf"] = tf.Variable(_jax_to_tf_deconv(dec[k]))

    with tf.GradientTape() as tape:
        tf_pred, tf_loss = _build_tf_grcn_graph(
            tfp, tf.constant(c3d), tf.constant(gt_norm), b, t)
    tf_grads = tape.gradient(tf_loss, tfp)

    # ---- JAX model under test
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    ours = np.asarray(model.apply(jparams, jnp.asarray(frames),
                                  jnp.asarray(c3d), train=False))
    np.testing.assert_allclose(ours, tf_pred.numpy(), rtol=1e-5, atol=1e-5,
                               err_msg="gaze_grcn whole-network forward")

    batch = {"frames": jnp.asarray(frames), "c3d": jnp.asarray(c3d),
             "gazemaps": jnp.asarray(gt)}

    def loss_fn(p):
        # train=False: dropout off, like the TF oracle; the gt probability
        # normalization happens inside model.loss (gaze_rnn.py:499-500)
        return model.loss(p, batch, train=False)[0]

    jloss, jgrads = jax.value_and_grad(loss_fn)(jparams)
    np.testing.assert_allclose(float(jloss), float(tf_loss),
                               rtol=1e-5, atol=1e-6,
                               err_msg="gaze_grcn whole-network loss")

    # every parameter's gradient, mapped back to the JAX layout
    flat_expected = {}
    for k in params["c3d_proj"]:
        flat_expected[("c3d_proj", k)] = tf_grads[k].numpy()
    for k in params["cell"]:
        flat_expected[("cell", k)] = tf_grads[k].numpy()
    for k in ("out_W", "out_b", "bn_scale", "bn_offset"):
        flat_expected[("decoder", k)] = tf_grads[k].numpy()
    for i, k in enumerate(("up1_w", "up2_w", "up3_w"), start=1):
        flat_expected[("decoder", k)] = _tf_from_jax_deconv_grad(
            tf_grads[f"up{i}_tf"].numpy())

    n_checked = 0
    for (group, k), expected in flat_expected.items():
        got = np.asarray(jgrads[group][k])
        # atol floor 1e-6: dL/d(out_b) is analytically ZERO (a uniform
        # logit shift is softmax-xent invariant), so both sides are fp32
        # round-off there (~1e-8) and only an absolute floor is meaningful
        scale = max(np.abs(expected).max(), 5e-3)
        np.testing.assert_allclose(
            got, expected, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"gaze_grcn whole-network dL/d{group}.{k}")
        n_checked += 1
    assert n_checked == 15  # 2 proj + 6 cell + 7 decoder


def test_tf_golden_grcn_cascade_whole_network_forward():
    """The two-level cascade (`gaze_grcn_cascade.py:188-424`) composed end
    to end vs raw TF2 ops: 1024->512 proj -> bottom ConvGRU(256) at 7x7 ->
    deconv 11x11/s7 SAME -> top ConvGRU(3 units, 5x5) at 49x49 -> per-frame
    fc4802+relu+maxout x2 head. The most intricate composition in the zoo
    (two recurrences at different resolutions with a deconv in between)."""
    b, t = 2, 4
    model = registry.create_model("gaze_grcn_cascade", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32")
    rng = np.random.RandomState(29)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)

    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = rng.rand(b, t, 98, 98, 3).astype(np.float32)

    def c2d(a, k):
        return tf.nn.conv2d(a, k, [1, 1, 1, 1], padding="SAME")

    def convgru_loop(cell, xs_bt, spatial, units):
        h = tf.zeros((b, spatial, spatial, units), tf.float32)
        outs = []
        for i in range(t):
            xi = xs_bt[:, i]
            u = tf.sigmoid(c2d(xi, cell["W_z"]) + c2d(h, cell["U_z"]))
            r = tf.sigmoid(c2d(xi, cell["W_r"]) + c2d(h, cell["U_r"]))
            cand = tf.tanh(c2d(xi, cell["W"]) + c2d(r * h, cell["U"]))
            h = u * h + (1.0 - u) * cand
            outs.append(h)
        return outs

    # projection (cascade has NO dropout on the embedding, :270-276)
    x = tf.transpose(tf.constant(c3d), perm=[0, 1, 3, 4, 2])
    emb = (tf.matmul(tf.reshape(x, [-1, 1024]),
                      params["c3d_proj"]["proj_c3d_W"])
           + params["c3d_proj"]["proj_c3d_b"])
    emb = tf.reshape(emb, [b, t, 7, 7, 512])

    bottom = convgru_loop(params["bottom_cell"], emb, 7, 256)

    up_tf = _jax_to_tf_deconv(params["up_w"])  # [11,11,64,256]
    upsampled = [tf.nn.conv2d_transpose(
        h, up_tf, output_shape=[b, 49, 49, 64], strides=[1, 7, 7, 1],
        padding="SAME") for h in bottom]

    top = convgru_loop(params["top_cell"],
                       tf.stack(upsampled, axis=1), 49, 3)

    maps = []
    for i in range(t):
        flat = tf.reshape(top[i], [b, -1])
        fc1 = tf.nn.relu(tf.matmul(flat, params["fc1_w"])
                         + params["fc1_b"])
        s1, s2 = tf.split(fc1, 2, axis=1)
        mo1 = tf.maximum(s1, s2)
        fc2 = tf.nn.relu(tf.matmul(mo1, params["fc2_w"])
                         + params["fc2_b"])
        s1, s2 = tf.split(fc2, 2, axis=1)
        maps.append(tf.reshape(tf.maximum(s1, s2), [b, 49, 49]))
    expected = tf.transpose(tf.stack(maps), [1, 0, 2, 3]).numpy()

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    ours = np.asarray(model.apply(jparams, jnp.asarray(frames),
                                  jnp.asarray(c3d), train=False))
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-5,
                               err_msg="gaze_grcn_cascade whole-network")


def test_caffemodel_full_shape_dress_rehearsal(tmp_path):
    """The FULL Sports-1M layer/shape schedule through the ACTUAL V1
    protobuf schema (VERDICT r3 item 8): all 8 convs at true shapes
    ([out,in,3,3,3] blobs) plus fc6-1/fc7-1/fc8-1 at true shapes in the
    V1-era (1,1,1,out,in) layout, random payload. Asserts
    `c3d_params_from_caffemodel` ingests every tensor into
    `models/c3d.py` shapes BIT-EXACTLY (transposes checked against
    independently computed references) and that the ingested tree runs a
    conv5b forward. After this, the only untested interop surface is the
    real artifact itself (not in the container;
    `extract_C3D_features.py:695-701`)."""
    # NOTE: must reuse module name "cafv1" — the proto text declares
    # `package cafv1;`, and compiling it under a second module name would
    # register duplicate symbols in the process-wide protobuf descriptor
    # pool (TypeError) whenever the v1-framing test ran first. The import
    # is cached by sys.modules, so this either compiles fresh (test run
    # alone) or reuses the identical generated API (full suite).
    pb = _compile_proto(tmp_path, "cafv1", _CAFFE_PROTO_V1)
    rng = np.random.RandomState(5)

    conv_payloads = {}
    fc_payloads = {}
    net = pb.NetParameter(name="DeepConv3DNet_Sport1M")
    in_ch = 3
    for name, out_ch in c3d_model.CONV_LAYERS:
        w = (rng.randn(out_ch, in_ch, 3, 3, 3) * 0.05).astype(np.float32)
        b = rng.randn(out_ch).astype(np.float32) * 0.01
        conv_payloads[name] = (w, b)
        layer = net.layers.add(name=name)
        blob = layer.blobs.add()
        (blob.num, blob.channels, blob.length,
         blob.height, blob.width) = w.shape
        blob.data.extend(w.reshape(-1).tolist())
        blob_b = layer.blobs.add()
        (blob_b.num, blob_b.channels, blob_b.length,
         blob_b.height, blob_b.width) = (1, 1, 1, 1, out_ch)
        blob_b.data.extend(b.tolist())
        in_ch = out_ch
    for name, d_in, d_out in c3d_model.FC_LAYERS:
        w = (rng.randn(d_out, d_in) * 0.01).astype(np.float32)
        b = rng.randn(d_out).astype(np.float32) * 0.01
        fc_payloads[name] = (w, b)
        layer = net.layers.add(name=f"{name}-1")
        blob = layer.blobs.add()
        (blob.num, blob.channels, blob.length,
         blob.height, blob.width) = (1, 1, 1, d_out, d_in)
        blob.data.extend(w.reshape(-1).tolist())
        blob_b = layer.blobs.add()
        (blob_b.num, blob_b.channels, blob_b.length,
         blob_b.height, blob_b.width) = (1, 1, 1, 1, d_out)
        blob_b.data.extend(b.tolist())

    path = str(tmp_path / "sports1m_full.caffemodel")
    open(path, "wb").write(net.SerializeToString())

    params = c3d_params_from_caffemodel(path)

    # every conv ingested bit-exactly: [out,in,d,h,w] -> DHWIO
    for name, _ in c3d_model.CONV_LAYERS:
        w, b = conv_payloads[name]
        np.testing.assert_array_equal(
            np.asarray(params[f"{name}_w"]),
            np.transpose(w, (2, 3, 4, 1, 0)), err_msg=name)
        np.testing.assert_array_equal(np.asarray(params[f"{name}_b"]), b,
                                      err_msg=name)
    # every fc ingested bit-exactly: [out,in] -> [in,out]
    for name, d_in, d_out in c3d_model.FC_LAYERS:
        w, b = fc_payloads[name]
        assert params[f"{name}_w"].shape == (d_in, d_out)
        np.testing.assert_array_equal(np.asarray(params[f"{name}_w"]), w.T,
                                      err_msg=name)
        np.testing.assert_array_equal(np.asarray(params[f"{name}_b"]), b,
                                      err_msg=name)

    feats = c3d_model.apply(jax.tree_util.tree_map(jnp.asarray, params),
                            jnp.ones((1, 16, 112, 112, 3)) * 0.5,
                            feature_layer="conv5b")
    assert feats.shape == (1, 2, 7, 7, 512)
    assert np.isfinite(np.asarray(feats)).all()


def test_tf_golden_rnn_whole_network_forward():
    """The third composition family: gaze_rnn (`/root/reference/models/
    gaze_rnn.py:211-360`) end to end vs raw TF2 ops — ShallowNet frame
    branch (computed, unused downstream per the reference's commented-out
    concat :330-336), 1024->32 projection, flat GRUCell with the 1617
    state (7*7*32 + 7*7), per-step FC to the 2401 logits. Pins BOTH the
    ShallowNet branch maps and the final logits at fp32."""
    b, t = 2, 6
    model = registry.create_model("gaze_rnn", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="float32")
    rng = np.random.RandomState(31)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)

    frames = rng.rand(b, t, 98, 98, 3).astype(np.float32)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    sn = params["shallownet"]

    # ---- ShallowNet branch (saliency_shallownet.py:74-216), folded B*T
    x = tf.constant(frames.reshape(-1, 98, 98, 3))
    x = tf.nn.relu(tf.nn.conv2d(x, sn["conv1_w"], 1, "VALID")
                   + sn["conv1_b"])
    x = tf.nn.max_pool2d(x, 2, 2, "SAME")
    x = tf.nn.relu(tf.nn.conv2d(x, sn["conv2_w"], 1, "VALID")
                   + sn["conv2_b"])
    x = tf.nn.max_pool2d(x, 3, 2, "SAME")
    x = tf.nn.relu(tf.nn.conv2d(x, sn["conv3_w"], 1, "VALID")
                   + sn["conv3_b"])
    x = tf.nn.max_pool2d(x, 3, 2, "SAME")
    x = tf.reshape(x, (b * t, -1))
    x = tf.nn.relu(tf.matmul(x, sn["fc1_w"]) + sn["fc1_b"])
    x = _tf_maxout2(x)
    x = tf.nn.relu(tf.matmul(x, sn["fc2_w"]) + sn["fc2_b"])
    x = _tf_maxout2(x)
    tf_frm_sal = tf.reshape(x, (b, t, 49, 49)).numpy()

    # ---- c3d proj + flat GRU over T + per-step output FC
    emb = tf.matmul(
        tf.reshape(tf.transpose(tf.constant(c3d), [0, 1, 3, 4, 2]),
                   [-1, 1024]),
        params["c3d_proj"]["proj_c3d_W"]) + params["c3d_proj"]["proj_c3d_b"]
    emb = tf.reshape(emb, [b, t, 7 * 7 * 32])

    cell = params["cell"]
    units = cell["candidate_kernel"].shape[1]
    h = tf.zeros((b, units), tf.float32)
    logits = []
    for i in range(t):
        xi = emb[:, i]
        gates = tf.sigmoid(
            tf.matmul(tf.concat([xi, h], 1), cell["gates_kernel"])
            + cell["gates_bias"])
        r, u = tf.split(gates, 2, axis=1)
        cand = tf.tanh(
            tf.matmul(tf.concat([xi, r * h], 1), cell["candidate_kernel"])
            + cell["candidate_bias"])
        h = u * h + (1.0 - u) * cand
        out = tf.matmul(h, params["proj_out_W"]) + params["proj_out_b"]
        logits.append(tf.reshape(out, [b, 49, 49]))
    expected = tf.transpose(tf.stack(logits), [1, 0, 2, 3]).numpy()

    from recurrent_gaze_prediction_tpu.models import gaze_rnn

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    net = {}
    ours = np.asarray(gaze_rnn.apply(jparams, jnp.asarray(frames),
                                     jnp.asarray(c3d), model.cfg,
                                     train=False, net=net))
    np.testing.assert_allclose(np.asarray(net["frm_sal"]), tf_frm_sal,
                               rtol=1e-4, atol=1e-5,
                               err_msg="gaze_rnn ShallowNet branch")
    np.testing.assert_allclose(ours, expected, rtol=1e-5, atol=1e-5,
                               err_msg="gaze_rnn whole-network logits")


def test_tf_golden_lstm_whole_network_forward_loss_and_grads():
    """The fourth composition family: gaze_lstm (`/root/reference/models/
    gaze_lstm.py:160-355`) end to end vs raw TF2 ops at the reference dims
    (1024->512 proj, 128-unit peephole ConvLSTM, same 3-deconv decoder as
    gaze_grcn): forward maps at fp32 <=1e-5 (rtol), loss exact to fp32
    noise, and dL/dtheta for every one of the 20 parameters <=2e-4 —
    through the linearized decoder (B*T >= _COMPOSE_MIN_N)."""
    from recurrent_gaze_prediction_tpu.models.common import _COMPOSE_MIN_N

    b, t = 4, 8
    assert b * t >= _COMPOSE_MIN_N  # the linearized path must engage

    model = registry.create_model("gaze_lstm", n_lstm_steps=t, batch_size=b,
                                  compute_dtype="float32")
    rng = np.random.RandomState(37)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)
    params["decoder"]["bn_scale"] = (
        1.0 + 0.1 * rng.randn(128)).astype(np.float32)
    params["decoder"]["bn_offset"] = (
        0.1 * rng.randn(128)).astype(np.float32)

    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)  # unused by gaze_lstm
    gt = (rng.rand(b, t, 49, 49).astype(np.float32) + 0.01)
    gt_norm = gt / gt.sum(axis=(-2, -1), keepdims=True)

    # ---- TF oracle (tracks every parameter for gradients)
    tfp = {}
    for k, v in params["c3d_proj"].items():
        tfp[k] = tf.Variable(v)
    for k, v in params["cell"].items():
        tfp[k] = tf.Variable(v)
    dec = params["decoder"]
    for k in ("out_W", "out_b", "bn_scale", "bn_offset"):
        tfp[k] = tf.Variable(np.asarray(dec[k]))
    for i, k in enumerate(("up1_w", "up2_w", "up3_w"), start=1):
        tfp[f"up{i}_tf"] = tf.Variable(_jax_to_tf_deconv(dec[k]))

    with tf.GradientTape() as tape:
        tf_pred, tf_loss = _build_tf_lstm_graph(
            tfp, tf.constant(c3d), tf.constant(gt_norm), b, t)
    tf_grads = tape.gradient(tf_loss, tfp)

    # ---- JAX model under test
    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    ours = np.asarray(model.apply(jparams, jnp.asarray(frames),
                                  jnp.asarray(c3d), train=False))
    np.testing.assert_allclose(ours, tf_pred.numpy(), rtol=1e-5, atol=1e-5,
                               err_msg="gaze_lstm whole-network forward")

    batch = {"frames": jnp.asarray(frames), "c3d": jnp.asarray(c3d),
             "gazemaps": jnp.asarray(gt)}

    def loss_fn(p):
        return model.loss(p, batch, train=False)[0]

    jloss, jgrads = jax.value_and_grad(loss_fn)(jparams)
    np.testing.assert_allclose(float(jloss), float(tf_loss),
                               rtol=1e-5, atol=1e-6,
                               err_msg="gaze_lstm whole-network loss")

    flat_expected = {}
    for k in params["c3d_proj"]:
        flat_expected[("c3d_proj", k)] = tf_grads[k].numpy()
    for k in params["cell"]:
        flat_expected[("cell", k)] = tf_grads[k].numpy()
    for k in ("out_W", "out_b", "bn_scale", "bn_offset"):
        flat_expected[("decoder", k)] = tf_grads[k].numpy()
    for i, k in enumerate(("up1_w", "up2_w", "up3_w"), start=1):
        flat_expected[("decoder", k)] = _tf_from_jax_deconv_grad(
            tf_grads[f"up{i}_tf"].numpy())

    n_checked = 0
    for (group, k), expected in flat_expected.items():
        got = np.asarray(jgrads[group][k])
        # same atol floor rationale as the grcn golden: dL/d(out_b) is
        # analytically zero under softmax-xent, leaving only fp32 round-off
        scale = max(np.abs(expected).max(), 5e-3)
        np.testing.assert_allclose(
            got, expected, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"gaze_lstm whole-network dL/d{group}.{k}")
        n_checked += 1
    assert n_checked == 20  # 2 proj + 11 cell + 7 decoder


def test_tf_golden_grcn77_and_c3d_conv_whole_network_forward():
    """Forward parity for the two remaining distinct compositions, vs raw
    TF2 ops. With these, every registered family's composition is anchored:
    gaze_grcn77 (`/root/reference/models/gaze_grcn77.py:100-218`: proj ->
    ConvGRU at 7x7 -> per-cell 128->1 FC head, NO decoder) and
    gaze_c3d_conv (`/root/reference/models/gaze_c3d_conv.py:141-217`:
    proj straight into the 3-deconv decoder at 512 channels, NO cell, NO
    batch norm). gaze_rnn77 differs from the anchored gaze_rnn only by
    the [S, 49] output FC reshape to 7x7, and gaze_framewise_shallownet
    is the anchored ShallowNet forward applied per frame.
    """
    b, t = 2, 5
    rng = np.random.RandomState(41)

    def tf_proj(c3d, p, width):
        x = tf.transpose(tf.constant(c3d), perm=[0, 1, 3, 4, 2])
        emb = (tf.matmul(tf.reshape(x, [-1, 1024]), p["proj_c3d_W"])
               + p["proj_c3d_b"])
        return tf.reshape(emb, [b, t, 7, 7, width])

    # ---- gaze_grcn77
    model77 = registry.create_model("gaze_grcn77", n_lstm_steps=t,
                                    batch_size=b, compute_dtype="float32")
    p77 = _scaled_like(model77.init(jax.random.PRNGKey(0)), rng,
                       _default_scale)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)

    def c2d(a, k):
        return tf.nn.conv2d(a, k, [1, 1, 1, 1], padding="SAME")

    emb = tf_proj(c3d, p77["c3d_proj"], 512)
    cell = p77["cell"]
    h = tf.zeros((b, 7, 7, 128), tf.float32)
    outs = []
    for i in range(t):
        xi = emb[:, i]
        u = tf.sigmoid(c2d(xi, cell["W_z"]) + c2d(h, cell["U_z"]))
        r = tf.sigmoid(c2d(xi, cell["W_r"]) + c2d(h, cell["U_r"]))
        cand = tf.tanh(c2d(xi, cell["W"]) + c2d(r * h, cell["U"]))
        h = u * h + (1.0 - u) * cand
        # per-cell FC head (gaze_grcn77.py:183-212), dropout off
        y = tf.matmul(tf.reshape(h, [-1, 128]), p77["out_W"]) + p77["out_b"]
        outs.append(tf.reshape(y, [b, 7, 7]))
    expected77 = tf.transpose(tf.stack(outs), [1, 0, 2, 3]).numpy()

    ours77 = np.asarray(model77.apply(
        jax.tree_util.tree_map(jnp.asarray, p77), jnp.asarray(frames),
        jnp.asarray(c3d), train=False))
    np.testing.assert_allclose(ours77, expected77, rtol=1e-5, atol=1e-5,
                               err_msg="gaze_grcn77 whole-network")

    # ---- gaze_c3d_conv
    mconv = registry.create_model("gaze_c3d_conv", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32")
    pcv = _scaled_like(mconv.init(jax.random.PRNGKey(0)), rng,
                       _default_scale)
    c3d2 = rng.rand(b, t, 1024, 7, 7).astype(np.float32)

    emb2 = tf.reshape(tf_proj(c3d2, pcv["c3d_proj"], 512), [b * t, 7, 7, 512])
    dec = pcv["decoder"]
    y = tf.nn.conv2d_transpose(emb2, _jax_to_tf_deconv(dec["up1_w"]),
                               output_shape=[b * t, 23, 23, 64],
                               strides=[1, 3, 3, 1], padding="VALID")
    y = tf.nn.conv2d_transpose(y, _jax_to_tf_deconv(dec["up2_w"]),
                               output_shape=[b * t, 49, 49, 32],
                               strides=[1, 2, 2, 1], padding="VALID")
    y = tf.nn.conv2d_transpose(y, _jax_to_tf_deconv(dec["up3_w"]),
                               output_shape=[b * t, 49, 49, 12],
                               strides=[1, 1, 1, 1], padding="SAME")
    y = tf.matmul(tf.reshape(y, [-1, 12]), dec["out_W"]) + dec["out_b"]
    expected_cv = tf.reshape(y, [b, t, 49, 49]).numpy()

    ours_cv = np.asarray(mconv.apply(
        jax.tree_util.tree_map(jnp.asarray, pcv), jnp.asarray(frames),
        jnp.asarray(c3d2), train=False))
    np.testing.assert_allclose(ours_cv, expected_cv, rtol=1e-5, atol=1e-5,
                               err_msg="gaze_c3d_conv whole-network")


def test_tf_golden_pupil_grcn_whole_network_forward_loss_and_grads():
    """Legacy prototype #1: the pupil-head GRU-RCN
    (`/root/reference/model_gru_rcn.py:95-144`) end to end vs raw TF2 ops —
    1024->32 projection, ConvGRU over T, ONE joint [7*7*units, 50]
    projection emitting gaze logits and the pupil scalar together, loss =
    sum_t [ l2_loss(gaze) + 0.01 * l2_loss(pupil) ] / B (division by batch
    size ONLY, raw un-normalized gaze targets). Pins the joint logits, the
    loss, and dL/dtheta for every parameter at fp32."""
    b, t = 2, 5
    model = registry.create_model("gaze_pupil_grcn", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32",
                                  rnn_state_size=16)
    rng = np.random.RandomState(41)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)

    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)  # unused
    gazemaps = rng.rand(b, t, 7, 7).astype(np.float32)
    pupils = rng.rand(b, t).astype(np.float32)

    tfp = {}
    for k, v in params["c3d_proj"].items():
        tfp[k] = tf.Variable(v)
    for k, v in params["cell"].items():
        tfp[k] = tf.Variable(v)
    tfp["proj_out_W"] = tf.Variable(params["proj_out_W"])
    tfp["proj_out_b"] = tf.Variable(params["proj_out_b"])

    def c2d(a, k):
        return tf.nn.conv2d(a, tfp[k], [1, 1, 1, 1], padding="SAME")

    units = params["cell"]["U"].shape[-1]
    with tf.GradientTape() as tape:
        emb = tf.matmul(
            tf.reshape(tf.transpose(tf.constant(c3d), [0, 1, 3, 4, 2]),
                       [-1, 1024]),
            tfp["proj_c3d_W"]) + tfp["proj_c3d_b"]
        emb = tf.reshape(emb, [b, t, 7, 7, -1])
        h = tf.zeros((b, 7, 7, units), tf.float32)
        joints = []
        tf_loss = 0.0
        for i in range(t):
            x = emb[:, i]
            u = tf.sigmoid(c2d(x, "W_z") + c2d(h, "U_z"))
            r = tf.sigmoid(c2d(x, "W_r") + c2d(h, "U_r"))
            cand = tf.tanh(c2d(x, "W") + c2d(r * h, "U"))
            h = u * h + (1.0 - u) * cand
            joint = tf.matmul(tf.reshape(h, [b, -1]),
                              tfp["proj_out_W"]) + tfp["proj_out_b"]
            joints.append(joint)
            # tf.nn.l2_loss = 0.5 * sum(sq) (model_gru_rcn.py:135-140)
            gaze_l2 = 0.5 * tf.reduce_sum(
                tf.square(joint[:, :49]
                          - tf.reshape(gazemaps[:, i], [b, -1])))
            pupil_l2 = 0.5 * tf.reduce_sum(
                tf.square(joint[:, 49] - pupils[:, i]))
            tf_loss = tf_loss + gaze_l2 + 0.01 * pupil_l2
        tf_loss = tf_loss / float(b)  # model_gru_rcn.py:144: / B only
    tf_grads = tape.gradient(tf_loss, tfp)
    tf_joint = tf.transpose(tf.stack(joints), [1, 0, 2]).numpy()

    from recurrent_gaze_prediction_tpu.models import gaze_legacy

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    ours_joint = np.asarray(gaze_legacy.apply_pupil_grcn(
        jparams, jnp.asarray(frames), jnp.asarray(c3d), model.cfg,
        train=False))
    np.testing.assert_allclose(ours_joint, tf_joint, rtol=1e-5, atol=1e-5,
                               err_msg="gaze_pupil_grcn whole-network joint")

    batch = {"frames": jnp.asarray(frames), "c3d": jnp.asarray(c3d),
             "gazemaps": jnp.asarray(gazemaps), "pupils": jnp.asarray(pupils)}

    def loss_fn(p):
        return model.loss(p, batch, train=False)[0]

    jloss, jgrads = jax.value_and_grad(loss_fn)(jparams)
    np.testing.assert_allclose(float(jloss), float(tf_loss),
                               rtol=1e-5, atol=1e-6,
                               err_msg="gaze_pupil_grcn whole-network loss")

    flat_expected = {}
    for k in params["c3d_proj"]:
        flat_expected[("c3d_proj", k)] = tf_grads[k].numpy()
    for k in params["cell"]:
        flat_expected[("cell", k)] = tf_grads[k].numpy()
    for k in ("proj_out_W", "proj_out_b"):
        flat_expected[(k,)] = tf_grads[k].numpy()

    n_checked = 0
    for path, expected in flat_expected.items():
        got = jgrads
        for key in path:
            got = got[key]
        got = np.asarray(got)
        scale = max(np.abs(expected).max(), 5e-3)
        np.testing.assert_allclose(
            got, expected, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"gaze_pupil_grcn dL/d{'.'.join(path)}")
        n_checked += 1
    assert n_checked == 10  # 2 proj + 6 cell + 2 joint head


def test_tf_golden_pupil_gru2_whole_network_forward_loss_and_grads():
    """Legacy prototype #2: the teacher-forced 2-layer GRU
    (`/root/reference/model_2layer_gru.py:42-98`) end to end vs raw TF2
    ops — 1024->32 projection, per-step input = [c3d embedding | embedding
    of the PREVIOUS step's ground-truth joint target through the TIED
    inverse projection transpose(proj_out_W) (model_2layer_gru.py:50,
    80-82)], flat GRU, joint [49 gaze | 1 pupil] head, loss = sum_t
    [ softmax-xent(gaze) + 0.5 * l2_loss(pupil) ] / B. The gradient check
    covers the tie: dL/d(proj_out_W) must include the feedback-embedding
    path's contribution through the transpose."""
    b, t = 2, 5
    model = registry.create_model("gaze_pupil_gru2", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32",
                                  rnn_state_size=24)
    rng = np.random.RandomState(43)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)

    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    frames = np.zeros((b, t, 98, 98, 3), np.float32)  # unused
    gazemaps = (rng.rand(b, t, 7, 7).astype(np.float32) + 0.01)
    pupils = rng.rand(b, t).astype(np.float32)
    gt_norm = gazemaps / gazemaps.sum(axis=(-2, -1), keepdims=True)
    # the per-step joint target [gaze flat | pupil], as the loss builds it
    targets = np.concatenate(
        [gt_norm.reshape(b, t, 49), pupils[..., None]], axis=-1)

    tfp = {}
    for k, v in params["c3d_proj"].items():
        tfp[k] = tf.Variable(v)
    for k, v in params["cell"].items():
        tfp[k] = tf.Variable(v)
    tfp["proj_out_W"] = tf.Variable(params["proj_out_W"])
    tfp["proj_out_b"] = tf.Variable(params["proj_out_b"])

    state = params["cell"]["candidate_kernel"].shape[1]
    with tf.GradientTape() as tape:
        emb = tf.matmul(
            tf.reshape(tf.transpose(tf.constant(c3d), [0, 1, 3, 4, 2]),
                       [-1, 1024]),
            tfp["proj_c3d_W"]) + tfp["proj_c3d_b"]
        emb = tf.reshape(emb, [b, t, -1])
        inv_proj = tf.transpose(tfp["proj_out_W"])  # tied (:50)
        h = tf.zeros((b, state), tf.float32)
        logits_steps = []
        tf_loss = 0.0
        for i in range(t):
            if i == 0:
                current = tf.zeros((b, state), tf.float32)
            else:
                current = tf.matmul(
                    tf.constant(targets[:, i - 1]) - tfp["proj_out_b"],
                    inv_proj)
            xi = tf.concat([emb[:, i], current], axis=1)
            gates = tf.sigmoid(
                tf.matmul(tf.concat([xi, h], 1), tfp["gates_kernel"])
                + tfp["gates_bias"])
            r, u = tf.split(gates, 2, axis=1)
            cand = tf.tanh(
                tf.matmul(tf.concat([xi, r * h], 1), tfp["candidate_kernel"])
                + tfp["candidate_bias"])
            h = u * h + (1.0 - u) * cand
            logit = tf.matmul(h, tfp["proj_out_W"]) + tfp["proj_out_b"]
            logits_steps.append(logit)
            xent = tf.nn.softmax_cross_entropy_with_logits(
                labels=tf.constant(gt_norm[:, i].reshape(b, 49)),
                logits=logit[:, :49])
            pupil_l2 = 0.5 * tf.reduce_sum(
                tf.square(logit[:, 49] - pupils[:, i]))
            tf_loss = tf_loss + tf.reduce_sum(xent) + 0.5 * pupil_l2
        tf_loss = tf_loss / float(b)  # model_2layer_gru.py:98: / B only
    tf_grads = tape.gradient(tf_loss, tfp)
    tf_logits = tf.transpose(tf.stack(logits_steps), [1, 0, 2]).numpy()

    from recurrent_gaze_prediction_tpu.models import gaze_legacy

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    ours_logits = np.asarray(gaze_legacy.apply_pupil_gru2(
        jparams, jnp.asarray(frames), jnp.asarray(c3d),
        jnp.asarray(targets), model.cfg, train=False))
    np.testing.assert_allclose(ours_logits, tf_logits,
                               rtol=1e-5, atol=1e-5,
                               err_msg="gaze_pupil_gru2 whole-network joint")

    batch = {"frames": jnp.asarray(frames), "c3d": jnp.asarray(c3d),
             "gazemaps": jnp.asarray(gazemaps), "pupils": jnp.asarray(pupils)}

    def loss_fn(p):
        return model.loss(p, batch, train=False)[0]

    jloss, jgrads = jax.value_and_grad(loss_fn)(jparams)
    np.testing.assert_allclose(float(jloss), float(tf_loss),
                               rtol=1e-5, atol=1e-6,
                               err_msg="gaze_pupil_gru2 whole-network loss")

    flat_expected = {}
    for k in params["c3d_proj"]:
        flat_expected[("c3d_proj", k)] = tf_grads[k].numpy()
    for k in params["cell"]:
        flat_expected[("cell", k)] = tf_grads[k].numpy()
    for k in ("proj_out_W", "proj_out_b"):
        flat_expected[(k,)] = tf_grads[k].numpy()

    n_checked = 0
    for path, expected in flat_expected.items():
        got = jgrads
        for key in path:
            got = got[key]
        got = np.asarray(got)
        scale = max(np.abs(expected).max(), 5e-3)
        np.testing.assert_allclose(
            got, expected, rtol=2e-4, atol=2e-4 * scale,
            err_msg=f"gaze_pupil_gru2 dL/d{'.'.join(path)}")
        n_checked += 1
    assert n_checked == 8  # 2 proj + 4 cell + 2 joint head (tied inverse)


def test_tf_golden_rnn77_and_framewise_whole_network_forward():
    """Forward parity for the last two registry families vs raw TF2 ops.

    gaze_rnn77 (`/root/reference/models/gaze_rnn77.py:35-101` = gaze_rnn
    at GH=GW=7): the one piece of distinct composition is the 7x7/stride-7
    VALID avg-pool of the ShallowNet branch (gaze_rnn.py:262-269) plus the
    output projection to 49 cells — both pinned here, with the flat-GRU
    trunk, at fp32.

    gaze_framewise_shallownet (`/root/reference/models/
    gaze_framewise_shallownet.py:75-90`): ShallowNet applied framewise and
    reshaped to [B,T,49,49]."""
    b, t = 2, 4
    model = registry.create_model("gaze_rnn77", n_lstm_steps=t,
                                  batch_size=b, compute_dtype="float32")
    assert (model.cfg.gazemap_height, model.cfg.gazemap_width) == (7, 7)
    rng = np.random.RandomState(47)
    params = _scaled_like(model.init(jax.random.PRNGKey(0)), rng,
                          _default_scale)

    frames = rng.rand(b, t, 98, 98, 3).astype(np.float32)
    c3d = rng.rand(b, t, 1024, 7, 7).astype(np.float32)
    sn = params["shallownet"]

    def tf_shallownet(x):
        x = tf.nn.relu(tf.nn.conv2d(x, sn["conv1_w"], 1, "VALID")
                       + sn["conv1_b"])
        x = tf.nn.max_pool2d(x, 2, 2, "SAME")
        x = tf.nn.relu(tf.nn.conv2d(x, sn["conv2_w"], 1, "VALID")
                       + sn["conv2_b"])
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")
        x = tf.nn.relu(tf.nn.conv2d(x, sn["conv3_w"], 1, "VALID")
                       + sn["conv3_b"])
        x = tf.nn.max_pool2d(x, 3, 2, "SAME")
        x = tf.reshape(x, (x.shape[0], -1))
        x = tf.nn.relu(tf.matmul(x, sn["fc1_w"]) + sn["fc1_b"])
        x = _tf_maxout2(x)
        x = tf.nn.relu(tf.matmul(x, sn["fc2_w"]) + sn["fc2_b"])
        x = _tf_maxout2(x)
        return tf.reshape(x, (-1, 49, 49))

    sal = tf_shallownet(tf.constant(frames.reshape(-1, 98, 98, 3)))
    # the 77 regime's avg-pool (gaze_rnn.py:262-269)
    pooled = tf.nn.avg_pool(tf.expand_dims(sal, 3), [1, 7, 7, 1],
                            [1, 7, 7, 1], padding="VALID")
    tf_sal77 = tf.reshape(pooled, (b, t, 7, 7)).numpy()

    emb = tf.matmul(
        tf.reshape(tf.transpose(tf.constant(c3d), [0, 1, 3, 4, 2]),
                   [-1, 1024]),
        params["c3d_proj"]["proj_c3d_W"]) + params["c3d_proj"]["proj_c3d_b"]
    emb = tf.reshape(emb, [b, t, -1])
    cell = params["cell"]
    h = tf.zeros((b, cell["candidate_kernel"].shape[1]), tf.float32)
    logits = []
    for i in range(t):
        xi = emb[:, i]
        gates = tf.sigmoid(
            tf.matmul(tf.concat([xi, h], 1), cell["gates_kernel"])
            + cell["gates_bias"])
        r, u = tf.split(gates, 2, axis=1)
        cand = tf.tanh(
            tf.matmul(tf.concat([xi, r * h], 1), cell["candidate_kernel"])
            + cell["candidate_bias"])
        h = u * h + (1.0 - u) * cand
        out = tf.matmul(h, params["proj_out_W"]) + params["proj_out_b"]
        logits.append(tf.reshape(out, [b, 7, 7]))
    expected77 = tf.transpose(tf.stack(logits), [1, 0, 2, 3]).numpy()

    from recurrent_gaze_prediction_tpu.models import gaze_rnn

    jparams = jax.tree_util.tree_map(jnp.asarray, params)
    net = {}
    ours77 = np.asarray(gaze_rnn.apply(jparams, jnp.asarray(frames),
                                       jnp.asarray(c3d), model.cfg,
                                       train=False, net=net))
    np.testing.assert_allclose(np.asarray(net["frm_sal_77"]), tf_sal77,
                               rtol=1e-4, atol=1e-5,
                               err_msg="gaze_rnn77 pooled saliency branch")
    np.testing.assert_allclose(ours77, expected77, rtol=1e-5, atol=1e-5,
                               err_msg="gaze_rnn77 whole-network logits")

    # ---- gaze_framewise_shallownet: framewise reshape composition
    mfw = registry.create_model("gaze_framewise_shallownet", n_lstm_steps=t,
                                batch_size=b, compute_dtype="float32")
    pfw = _scaled_like(mfw.init(jax.random.PRNGKey(1)), rng, _default_scale)
    snfw = pfw["shallownet"] if "shallownet" in pfw else pfw
    sn = snfw
    expected_fw = tf.reshape(
        tf_shallownet(tf.constant(frames.reshape(-1, 98, 98, 3))),
        (b, t, 49, 49)).numpy()
    ours_fw = np.asarray(mfw.apply(
        jax.tree_util.tree_map(jnp.asarray, pfw), jnp.asarray(frames),
        jnp.asarray(c3d), train=False))
    np.testing.assert_allclose(ours_fw, expected_fw, rtol=1e-4, atol=1e-5,
                               err_msg="gaze_framewise_shallownet "
                                       "whole-network maps")
