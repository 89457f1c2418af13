"""ONNX wire format (utils/onnx_lite.py) + jnp executor (ops/onnx_jax.py).

Models are built with the in-repo writer, round-tripped through serialized
bytes, and executed; numerics are checked against independent numpy/scipy
implementations.  This is the TPU-native replacement for the reference's
onnxruntime dependency (calculate_nonintrusive_dnsmos.py:84-106).
"""

import struct
import numpy as np
import pytest
from scipy import signal as sps

from urgent2026_challenge_track1_tpu.ops import onnx_jax
from urgent2026_challenge_track1_tpu.utils import onnx_lite


def _model(nodes, initializers, inputs, outputs, input_shapes=None):
    g = onnx_lite.Graph(
        nodes=[onnx_lite.Node(*n) for n in nodes],
        initializers=initializers,
        inputs=list(inputs),
        outputs=list(outputs),
        input_shapes=input_shapes or {},
    )
    # serialize + reparse: every test exercises the wire format round-trip
    return onnx_lite.loads(onnx_lite.dumps(onnx_lite.Model(graph=g)))


def _session(model):
    return onnx_jax.InferenceSession(onnx_lite.dumps(model), jit=False)


def test_wire_roundtrip_preserves_graph():
    rng = np.random.default_rng(0)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    m = _model(
        [("Gemm", ["x", "w"], ["y"], {"transB": 1, "alpha": 2.0})],
        {"w": w},
        ["x"],
        ["y"],
        {"x": (1, 3)},
    )
    assert m.graph.nodes[0].op_type == "Gemm"
    assert m.graph.nodes[0].attrs["transB"] == 1
    assert m.graph.nodes[0].attrs["alpha"] == pytest.approx(2.0)
    np.testing.assert_array_equal(m.graph.initializers["w"], w)
    assert m.graph.inputs == ["x"] and m.graph.outputs == ["y"]
    assert m.graph.input_shapes["x"] == (1, 3)


def test_gemm_matmul_against_numpy():
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    w = rng.standard_normal((4, 3)).astype(np.float32)
    b = rng.standard_normal(4).astype(np.float32)
    m = _model(
        [("Gemm", ["x", "w", "b"], ["y"], {"transB": 1, "alpha": 1.5, "beta": 0.5})],
        {"w": w, "b": b},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, 1.5 * x @ w.T + 0.5 * b, rtol=1e-5)


@pytest.mark.parametrize("pads,strides,group", [([1, 1, 1, 1], [1, 1], 1), ([0, 0, 0, 0], [2, 2], 1), ([2, 1, 2, 1], [1, 2], 2)])
def test_conv2d_against_scipy(pads, strides, group):
    rng = np.random.default_rng(2)
    ci, co, k = 4, 6, 3
    x = rng.standard_normal((1, ci, 9, 8)).astype(np.float32)
    w = rng.standard_normal((co, ci // group, k, k)).astype(np.float32)
    b = rng.standard_normal(co).astype(np.float32)
    m = _model(
        [("Conv", ["x", "w", "b"], ["y"], {"pads": pads, "strides": strides, "group": group})],
        {"w": w, "b": b},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    # independent reference: scipy correlate2d per (out, in) channel pair
    xp = np.pad(x, [(0, 0), (0, 0), (pads[0], pads[2]), (pads[1], pads[3])])
    cig = ci // group
    cog = co // group
    ref = np.zeros((1, co, xp.shape[2] - k + 1, xp.shape[3] - k + 1), np.float32)
    for o in range(co):
        gidx = o // cog
        for i in range(cig):
            ref[0, o] += sps.correlate2d(xp[0, gidx * cig + i], w[o, i], mode="valid")
        ref[0, o] += b[o]
    ref = ref[:, :, :: strides[0], :: strides[1]]
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-4)


def test_small_cnn_pipeline():
    """Conv→BN→Relu→MaxPool→GlobalAveragePool→Flatten→Gemm→Sigmoid, the
    DNSMOS-style topology, vs a hand-rolled numpy forward."""
    rng = np.random.default_rng(3)
    x = rng.standard_normal((2, 1, 12, 10)).astype(np.float32)
    w1 = rng.standard_normal((3, 1, 3, 3)).astype(np.float32)
    bn_scale = rng.uniform(0.5, 1.5, 3).astype(np.float32)
    bn_bias = rng.standard_normal(3).astype(np.float32)
    bn_mean = rng.standard_normal(3).astype(np.float32)
    bn_var = rng.uniform(0.5, 2.0, 3).astype(np.float32)
    w2 = rng.standard_normal((1, 3)).astype(np.float32)
    b2 = rng.standard_normal(1).astype(np.float32)
    m = _model(
        [
            ("Conv", ["x", "w1"], ["c"], {"pads": [1, 1, 1, 1]}),
            ("BatchNormalization", ["c", "bns", "bnb", "bnm", "bnv"], ["n"], {"epsilon": 1e-5}),
            ("Relu", ["n"], ["r"], {}),
            ("MaxPool", ["r"], ["p"], {"kernel_shape": [2, 2], "strides": [2, 2]}),
            ("GlobalAveragePool", ["p"], ["g"], {}),
            ("Flatten", ["g"], ["f"], {}),
            ("Gemm", ["f", "w2", "b2"], ["l"], {"transB": 1}),
            ("Sigmoid", ["l"], ["y"], {}),
        ],
        {"w1": w1, "bns": bn_scale, "bnb": bn_bias, "bnm": bn_mean, "bnv": bn_var, "w2": w2, "b2": b2},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})

    # numpy reference
    xp = np.pad(x, [(0, 0), (0, 0), (1, 1), (1, 1)])
    c = np.zeros((2, 3, 12, 10), np.float32)
    for bidx in range(2):
        for o in range(3):
            c[bidx, o] = sps.correlate2d(xp[bidx, 0], w1[o, 0], mode="valid")
    n = (c - bn_mean[None, :, None, None]) / np.sqrt(bn_var[None, :, None, None] + 1e-5)
    n = n * bn_scale[None, :, None, None] + bn_bias[None, :, None, None]
    r = np.maximum(n, 0)
    p = r[:, :, : 12 // 2 * 2, : 10 // 2 * 2].reshape(2, 3, 6, 2, 5, 2).max(axis=(3, 5))
    g = p.mean(axis=(2, 3))
    ref = 1 / (1 + np.exp(-(g @ w2.T + b2)))
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)


def test_avgpool_count_exclude_pad():
    x = np.ones((1, 1, 4, 4), np.float32)
    m = _model(
        [("AveragePool", ["x"], ["y"], {"kernel_shape": [3, 3], "strides": [1, 1], "pads": [1, 1, 1, 1]})],
        {},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    # with count_include_pad=0 (default) every output is exactly 1
    np.testing.assert_allclose(y, np.ones_like(x), rtol=1e-6)


def test_shape_reshape_concat_static_under_jit():
    rng = np.random.default_rng(4)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    tgt = np.array([2, 12], np.int64)
    m = _model(
        [
            ("Reshape", ["x", "tgt"], ["f"], {}),
            ("Concat", ["f", "f"], ["y"], {"axis": 1}),
        ],
        {"tgt": tgt},
        ["x"],
        ["y"],
    )
    sess = onnx_jax.InferenceSession(onnx_lite.dumps(m), jit=True)  # jitted path
    (y,) = sess.run(None, {"x": x})
    np.testing.assert_allclose(y, np.concatenate([x.reshape(2, 12)] * 2, axis=1), rtol=1e-6)


def test_lstm_iofc_gate_order_against_numpy():
    rng = np.random.default_rng(5)
    T, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32) * 0.4
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32) * 0.4
    b = rng.standard_normal((1, 8 * H)).astype(np.float32) * 0.1
    m = _model(
        [("LSTM", ["x", "w", "r", "b"], ["y", "hn", "cn"], {"hidden_size": H})],
        {"w": w, "r": r, "b": b},
        ["x"],
        ["y", "hn", "cn"],
    )
    y, hn, cn = _session(m).run(None, {"x": x})

    def sig(v):
        return 1 / (1 + np.exp(-v))

    h = np.zeros((B, H)); c = np.zeros((B, H))
    ys = []
    wb, rb = b[0, : 4 * H], b[0, 4 * H :]
    for t in range(T):
        g = x[t] @ w[0].T + h @ r[0].T + wb + rb
        i_, o_, f_, c_ = np.split(g, 4, axis=-1)  # ONNX iofc order
        c = sig(f_) * c + sig(i_) * np.tanh(c_)
        h = sig(o_) * np.tanh(c)
        ys.append(h.copy())
    ref = np.stack(ys)[:, None]  # (T, 1, B, H)
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(hn[0], ys[-1], rtol=1e-4, atol=1e-5)


def test_slice_gather_reduce():
    rng = np.random.default_rng(6)
    x = rng.standard_normal((3, 8)).astype(np.float32)
    m = _model(
        [
            ("Slice", ["x", "st", "en", "ax"], ["s"], {}),
            ("ReduceMean", ["s"], ["y"], {"axes": [1], "keepdims": 0}),
        ],
        {"st": np.array([2], np.int64), "en": np.array([6], np.int64), "ax": np.array([1], np.int64)},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, x[:, 2:6].mean(axis=1), rtol=1e-5)


def test_unsupported_op_fails_actionably():
    m = _model([("NonMaxSuppression", ["x"], ["y"], {})], {}, ["x"], ["y"])
    with pytest.raises(NotImplementedError, match="NonMaxSuppression"):
        onnx_jax.InferenceSession(onnx_lite.dumps(m))


def test_session_facade_matches_onnxruntime_surface():
    m = _model(
        [("Relu", ["input_1"], ["out"], {})], {}, ["input_1"], ["out"], {"input_1": (1, 5)}
    )
    sess = _session(m)
    assert [i.name for i in sess.get_inputs()] == ["input_1"]
    assert sess.get_inputs()[0].shape == (1, 5)
    x = np.array([[-1.0, 2.0, -3.0, 4.0, 0.0]], np.float32)
    (y,) = sess.run(["out"], {"input_1": x})
    np.testing.assert_array_equal(y, np.maximum(x, 0))


@pytest.mark.parametrize("seed", range(4))
def test_parser_rejects_garbage_without_crashing(seed):
    rng = np.random.default_rng(seed)
    junk = rng.integers(0, 256, 512, dtype=np.uint8).tobytes()
    with pytest.raises((ValueError, KeyError, struct.error, IndexError, TypeError)):
        onnx_lite.loads(junk)


def test_parser_rejects_truncated_model():
    m = _model([("Relu", ["x"], ["y"], {})], {}, ["x"], ["y"])
    data = onnx_lite.dumps(m)
    for cut in (1, len(data) // 2, len(data) - 1):
        with pytest.raises(Exception):
            mm = onnx_lite.loads(data[:cut])
            # a prefix that still parses must at least not invent a graph
            if mm.graph.nodes:
                raise ValueError("parsed garbage graph")


def test_external_data_fails_loudly():
    # tensor with external_data field (13) must raise, not yield zeros
    t = onnx_lite._encode_tensor("w", np.zeros(2, np.float32))
    t += onnx_lite._tag(13, 2) + onnx_lite._write_varint(0)
    with pytest.raises(ValueError, match="external"):
        onnx_lite._decode_tensor(memoryview(t))


def test_shape_gather_concat_reshape_export_pattern():
    """The canonical TF/torch-export idiom: Shape -> Gather -> Unsqueeze ->
    Concat -> Reshape must work (Shape-derived values stay concrete)."""
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    m = _model(
        [
            ("Shape", ["x"], ["shp"], {}),
            ("Gather", ["shp", "zero"], ["b"], {"axis": 0}),
            ("Unsqueeze", ["b"], ["bu"], {"axes": [0]}),
            ("Concat", ["bu", "minus1"], ["tgt"], {"axis": 0}),
            ("Reshape", ["x", "tgt"], ["y"], {}),
        ],
        {"zero": np.array(0, np.int64), "minus1": np.array([-1], np.int64)},
        ["x"],
        ["y"],
    )
    for jit in (False, True):
        sess = onnx_jax.InferenceSession(onnx_lite.dumps(m), jit=jit)
        (y,) = sess.run(None, {"x": x})
        np.testing.assert_allclose(y, x.reshape(2, 12), rtol=1e-6)


def test_maxpool_ceil_mode():
    """ONNX spec example: 7-wide, kernel 2, stride 2, ceil_mode=1 -> 4 outputs."""
    x = np.arange(7, dtype=np.float32).reshape(1, 1, 1, 7)
    m = _model(
        [("MaxPool", ["x"], ["y"], {"kernel_shape": [1, 2], "strides": [1, 2], "ceil_mode": 1})],
        {},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_array_equal(y[0, 0, 0], [1, 3, 5, 6])


def test_maxpool_dilations():
    x = np.arange(6, dtype=np.float32).reshape(1, 1, 1, 6)
    m = _model(
        [("MaxPool", ["x"], ["y"], {"kernel_shape": [1, 2], "strides": [1, 1], "dilations": [1, 2]})],
        {},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    # effective window [i, i+2]: max over pairs 2 apart
    np.testing.assert_array_equal(y[0, 0, 0], [2, 3, 4, 5])


def test_split_uneven_default_sizes():
    """ONNX: equal ceil-sized chunks with a smaller last chunk (10 -> 4,4,2)."""
    x = np.arange(10, dtype=np.float32)
    m = _model(
        [("Split", ["x"], ["a", "b", "c"], {"axis": 0})],
        {},
        ["x"],
        ["a", "b", "c"],
    )
    a, b, c = _session(m).run(None, {"x": x})
    np.testing.assert_array_equal(a, [0, 1, 2, 3])
    np.testing.assert_array_equal(b, [4, 5, 6, 7])
    np.testing.assert_array_equal(c, [8, 9])


@pytest.mark.parametrize("lbr", [0, 1])
def test_gru_zrh_gate_order_against_numpy(lbr):
    rng = np.random.default_rng(8)
    T, B, I, H = 5, 2, 3, 4
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    w = (rng.standard_normal((1, 3 * H, I)) * 0.4).astype(np.float32)
    r = (rng.standard_normal((1, 3 * H, H)) * 0.4).astype(np.float32)
    b = (rng.standard_normal((1, 6 * H)) * 0.1).astype(np.float32)
    m = _model(
        [("GRU", ["x", "w", "r", "b"], ["y", "hn"],
          {"hidden_size": H, "linear_before_reset": lbr})],
        {"w": w, "r": r, "b": b},
        ["x"],
        ["y", "hn"],
    )
    y, hn = _session(m).run(None, {"x": x})

    def sig(v):
        return 1 / (1 + np.exp(-v))

    wb, rb = b[0, : 3 * H], b[0, 3 * H :]
    h = np.zeros((B, H))
    ys = []
    for t in range(T):
        gx = x[t] @ w[0].T + wb
        gh = h @ r[0].T + rb
        z = sig(gx[:, :H] + gh[:, :H])
        rt = sig(gx[:, H : 2 * H] + gh[:, H : 2 * H])
        if lbr:
            ht = np.tanh(gx[:, 2 * H :] + rt * gh[:, 2 * H :])
        else:
            ht = np.tanh(gx[:, 2 * H :] + (rt * h) @ r[0, 2 * H :].T + rb[2 * H :])
        h = (1 - z) * ht + z * h
        ys.append(h.copy())
    ref = np.stack(ys)[:, None]
    np.testing.assert_allclose(y, ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(hn[0], ys[-1], rtol=1e-4, atol=1e-5)


def test_maxpool_ceil_mode_ignores_padding_start_windows():
    """ONNX spec: sliding windows that would START in the right padded
    region are ignored (kernel 2, stride 3, end-pad 2 on a 5-wide input
    yields 2 outputs, not 3 — ORT/torch behavior)."""
    x = np.arange(5, dtype=np.float32).reshape(1, 1, 1, 5)
    m = _model(
        [("MaxPool", ["x"], ["y"], {"kernel_shape": [1, 2], "strides": [1, 3],
                                    "pads": [0, 0, 0, 2], "ceil_mode": 1})],
        {},
        ["x"],
        ["y"],
    )
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_array_equal(y[0, 0, 0], [1, 4])


def test_softmax_old_opset_2d_coercion():
    """opset <= 12 Softmax flattens trailing dims at axis (default 1): a
    (2, 2, 3) input normalizes over the 6-element tail, not the last axis."""
    rng = np.random.default_rng(9)
    x = rng.standard_normal((2, 2, 3)).astype(np.float32)
    g = onnx_lite.Graph(
        nodes=[onnx_lite.Node("Softmax", ["x"], ["y"], {})],
        initializers={}, inputs=["x"], outputs=["y"],
    )
    old = onnx_lite.Model(graph=g, opset=11)
    (y_old,) = onnx_jax.InferenceSession(onnx_lite.dumps(old), jit=False).run(None, {"x": x})
    flat = np.exp(x.reshape(2, -1))
    ref = (flat / flat.sum(-1, keepdims=True)).reshape(x.shape)
    np.testing.assert_allclose(y_old, ref, rtol=1e-5)
    new = onnx_lite.Model(graph=g, opset=17)
    (y_new,) = onnx_jax.InferenceSession(onnx_lite.dumps(new), jit=False).run(None, {"x": x})
    e = np.exp(x)
    np.testing.assert_allclose(y_new, e / e.sum(-1, keepdims=True), rtol=1e-5)


def test_shape_start_end_attrs():
    rng = np.random.default_rng(11)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    m = _model([("Shape", ["x"], ["s"], {"start": 1})], {}, ["x"], ["s"])
    (s,) = _session(m).run(None, {"x": x})
    np.testing.assert_array_equal(s, [3, 4])
    m = _model([("Shape", ["x"], ["s"], {"end": -1})], {}, ["x"], ["s"])
    (s,) = _session(m).run(None, {"x": x})
    np.testing.assert_array_equal(s, [2, 3])


def test_reduce_empty_axes_reduces_all():
    """ONNX noop_with_empty_axes=0 (default): empty axes input = full
    reduction; =1: identity."""
    rng = np.random.default_rng(12)
    x = rng.standard_normal((2, 3)).astype(np.float32)
    empty = np.array([], np.int64)
    m = _model([("ReduceSum", ["x", "ax"], ["y"], {"keepdims": 0})],
               {"ax": empty}, ["x"], ["y"])
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, x.sum(), rtol=1e-6)
    m = _model([("ReduceSum", ["x", "ax"], ["y"],
                 {"keepdims": 0, "noop_with_empty_axes": 1})],
               {"ax": empty}, ["x"], ["y"])
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, x, rtol=1e-6)


def test_reduceprod_numel_reshape_idiom():
    """Shape -> ReduceProd -> Reshape (exporter numel computation)."""
    rng = np.random.default_rng(13)
    x = rng.standard_normal((2, 3, 4)).astype(np.float32)
    m = _model(
        [("Shape", ["x"], ["s"], {}),
         ("ReduceProd", ["s"], ["n"], {"keepdims": 1}),
         ("Reshape", ["x", "n"], ["y"], {})],
        {}, ["x"], ["y"])
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, x.reshape(-1), rtol=1e-6)


def test_pad_negative_crop_wrap_and_axes():
    rng = np.random.default_rng(14)
    x = rng.standard_normal((2, 5)).astype(np.float32)
    # negative pads crop (opset>=11)
    m = _model([("Pad", ["x", "p"], ["y"], {})],
               {"p": np.array([0, -1, 0, -2], np.int64)}, ["x"], ["y"])
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, x[:, 1:3], rtol=1e-6)
    # wrap mode (opset>=19)
    m = _model([("Pad", ["x", "p"], ["y"], {"mode": "wrap"})],
               {"p": np.array([0, 2, 0, 0], np.int64)}, ["x"], ["y"])
    (y,) = _session(m).run(None, {"x": x})
    # ONNX pads layout: [x1_begin, x2_begin, x1_end, x2_end]
    np.testing.assert_allclose(y, np.pad(x, ((0, 0), (2, 0)), mode="wrap"),
                               rtol=1e-6)
    # opset-18 axes input: pad only axis 1
    m = _model([("Pad", ["x", "p", "", "ax"], ["y"], {})],
               {"p": np.array([1, 2], np.int64),
                "ax": np.array([1], np.int64)}, ["x"], ["y"])
    (y,) = _session(m).run(None, {"x": x})
    np.testing.assert_allclose(y, np.pad(x, ((0, 0), (1, 2))), rtol=1e-6)


def test_rnn_rejects_semantics_changing_attrs():
    """layout=1 / non-default activations / clip would change numerics
    silently if ignored — they must raise instead."""
    rng = np.random.default_rng(15)
    T, B, I, H = 3, 1, 2, 2
    x = rng.standard_normal((T, B, I)).astype(np.float32)
    w = rng.standard_normal((1, 4 * H, I)).astype(np.float32)
    r = rng.standard_normal((1, 4 * H, H)).astype(np.float32)
    for attrs, msg in [
        ({"hidden_size": H, "layout": 1}, "layout"),
        ({"hidden_size": H, "clip": 3.0}, "clip"),
        ({"hidden_size": H, "activations": ["Relu", "Tanh", "Tanh"]},
         "activations"),
    ]:
        m = _model([("LSTM", ["x", "w", "r"], ["y"], attrs)],
                   {"w": w, "r": r}, ["x"], ["y"])
        with pytest.raises(ValueError, match=msg):
            _session(m).run(None, {"x": x})
    # default activations (case-insensitive) still pass
    m = _model([("LSTM", ["x", "w", "r"], ["y"],
                 {"hidden_size": H,
                  "activations": ["Sigmoid", "Tanh", "Tanh"]})],
               {"w": w, "r": r}, ["x"], ["y"])
    _session(m).run(None, {"x": x})
    wg = rng.standard_normal((1, 3 * H, I)).astype(np.float32)
    rg = rng.standard_normal((1, 3 * H, H)).astype(np.float32)
    m = _model([("GRU", ["x", "wg", "rg"], ["y"],
                 {"hidden_size": H, "layout": 1})],
               {"wg": wg, "rg": rg}, ["x"], ["y"])
    with pytest.raises(ValueError, match="layout"):
        _session(m).run(None, {"x": x})
