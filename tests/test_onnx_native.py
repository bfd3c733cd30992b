"""Native ONNX path (CAM++ x-vector, VERDICT item 8): protobuf parsing of
synthetic ONNX weights, executor numerics vs an independent torch oracle,
Kaldi fbank / sox-norm front-end properties, and the gated
CampplusXVector.maybe_from_dir entry."""

import struct

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from qwen_tts_tpu.io.onnx_graph import load_onnx_graph
from qwen_tts_tpu.models.campplus import (
    CampplusXVector,
    kaldi_fbank,
    kaldi_mel_banks,
    sox_norm,
)
from qwen_tts_tpu.onnx_exec import OnnxModel


# ---------------------------------------------------------------------------
# Minimal protobuf writer (test-side only; the reader under test implements
# the wire format independently from the public spec)
# ---------------------------------------------------------------------------

def _varint(n: int) -> bytes:
    out = b""
    while True:
        b = n & 0x7F
        n >>= 7
        if n:
            out += bytes([b | 0x80])
        else:
            return out + bytes([b])


def _ld(field: int, payload: bytes) -> bytes:
    return _varint((field << 3) | 2) + _varint(len(payload)) + payload


def _vi(field: int, value: int) -> bytes:
    return _varint((field << 3) | 0) + _varint(value)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    dtype = {np.float32: 1, np.int64: 7}[arr.dtype.type]
    msg = b"".join(_vi(1, d) for d in arr.shape)
    msg += _vi(2, dtype)
    msg += _ld(8, name.encode())
    msg += _ld(9, arr.tobytes())
    return msg


def _attr_i(name: str, v: int) -> bytes:
    return _ld(5, _ld(1, name.encode()) + _vi(3, v))


def _attr_f(name: str, v: float) -> bytes:
    return _ld(5, _ld(1, name.encode())
               + _varint((2 << 3) | 5) + struct.pack("<f", v))


def _attr_ints(name: str, vals) -> bytes:
    return _ld(5, _ld(1, name.encode())
               + b"".join(_vi(8, v) for v in vals))


def _node(op: str, inputs, outputs, *attrs) -> bytes:
    msg = b"".join(_ld(1, s.encode()) for s in inputs)
    msg += b"".join(_ld(2, s.encode()) for s in outputs)
    msg += _ld(4, op.encode())
    msg += b"".join(attrs)
    return _ld(1, msg)


def _value_info(name: str) -> bytes:
    return _ld(1, name.encode())


def _model(nodes, initializers, inputs, outputs) -> bytes:
    graph = b"".join(nodes)
    graph += b"".join(_ld(5, t) for t in initializers)
    graph += b"".join(_ld(11, _value_info(n)) for n in inputs)
    graph += b"".join(_ld(12, _value_info(n)) for n in outputs)
    return _vi(1, 8) + _ld(7, graph)  # ir_version + ModelProto.graph


def _make_tdnn_onnx(rng) -> tuple:
    """A D-TDNN-flavoured graph: Conv→BN→ReLU→dilated grouped Conv→ReLU→
    mean/std stats pooling→Gemm — the op classes campplus.onnx exercises."""
    cin, c1, c2, dout, t = 80, 16, 16, 8, 37
    w1 = (rng.standard_normal((c1, cin, 5)) / 20).astype(np.float32)
    b1 = (rng.standard_normal(c1) / 10).astype(np.float32)
    bn_s = (1 + 0.1 * rng.standard_normal(c1)).astype(np.float32)
    bn_b = (0.1 * rng.standard_normal(c1)).astype(np.float32)
    bn_m = (0.1 * rng.standard_normal(c1)).astype(np.float32)
    bn_v = (1 + 0.1 * rng.standard_normal(c1)).astype(np.float32) ** 2
    w2 = (rng.standard_normal((c2, c1 // 2, 3)) / 7).astype(np.float32)
    b2 = (rng.standard_normal(c2) / 10).astype(np.float32)
    wg = (rng.standard_normal((dout, 2 * c2)) / 6).astype(np.float32)
    bg = (rng.standard_normal(dout) / 10).astype(np.float32)

    nodes = [
        # The real campplus.onnx takes [1, T, 80] and permutes internally
        # (the reference feeds feat.unsqueeze(0), speech_vq.py:151).
        _node("Transpose", ["x"], ["xt"], _attr_ints("perm", [0, 2, 1])),
        _node("Conv", ["xt", "w1", "b1"], ["h1"],
              _attr_ints("pads", [2, 2]), _attr_ints("strides", [1]),
              _attr_ints("dilations", [1]), _attr_i("group", 1),
              _attr_ints("kernel_shape", [5])),
        _node("BatchNormalization", ["h1", "bn_s", "bn_b", "bn_m", "bn_v"],
              ["h2"], _attr_f("epsilon", 1e-5)),
        _node("Relu", ["h2"], ["h3"]),
        _node("Conv", ["h3", "w2", "b2"], ["h4"],
              _attr_ints("pads", [2, 2]), _attr_ints("strides", [1]),
              _attr_ints("dilations", [2]), _attr_i("group", 2),
              _attr_ints("kernel_shape", [3])),
        _node("Relu", ["h4"], ["h5"]),
        _node("ReduceMean", ["h5"], ["mu_k"], _attr_ints("axes", [2]),
              _attr_i("keepdims", 1)),
        _node("Sub", ["h5", "mu_k"], ["dev"]),
        _node("Mul", ["dev", "dev"], ["dev2"]),
        _node("ReduceMean", ["dev2"], ["var"], _attr_ints("axes", [2]),
              _attr_i("keepdims", 0)),
        _node("Sqrt", ["var"], ["std"]),
        _node("ReduceMean", ["h5"], ["mu"], _attr_ints("axes", [2]),
              _attr_i("keepdims", 0)),
        _node("Concat", ["mu", "std"], ["stats"], _attr_i("axis", 1)),
        _node("Gemm", ["stats", "wg", "bg"], ["y"],
              _attr_i("transB", 1), _attr_f("alpha", 1.0),
              _attr_f("beta", 1.0)),
    ]
    inits = [
        _tensor("w1", w1), _tensor("b1", b1),
        _tensor("bn_s", bn_s), _tensor("bn_b", bn_b),
        _tensor("bn_m", bn_m), _tensor("bn_v", bn_v),
        _tensor("w2", w2), _tensor("b2", b2),
        _tensor("wg", wg), _tensor("bg", bg),
    ]
    blob = _model(nodes, inits, ["x", "w1", "b1", "bn_s", "bn_b", "bn_m",
                                 "bn_v", "w2", "b2", "wg", "bg"], ["y"])

    def torch_oracle(x):
        import torch.nn.functional as F

        x = np.transpose(x, (0, 2, 1)).copy()
        h = F.conv1d(torch.from_numpy(x), torch.from_numpy(w1),
                     torch.from_numpy(b1), padding=2)
        h = (h - torch.from_numpy(bn_m)[None, :, None]) * (
            torch.from_numpy(bn_s)[None, :, None]
            / torch.sqrt(torch.from_numpy(bn_v)[None, :, None] + 1e-5)
        ) + torch.from_numpy(bn_b)[None, :, None]
        h = F.relu(h)
        h = F.conv1d(h, torch.from_numpy(w2), torch.from_numpy(b2),
                     padding=2, dilation=2, groups=2)
        h = F.relu(h)
        mu = h.mean(-1)
        std = ((h - mu[..., None]) ** 2).mean(-1).sqrt()
        stats = torch.cat([mu, std], dim=1)
        return (stats @ torch.from_numpy(wg).T + torch.from_numpy(bg)).numpy()

    x = (rng.standard_normal((1, t, cin)) / 3).astype(np.float32)
    return blob, x, torch_oracle


def test_parser_golden_bytes():
    """Hand-encoded minimal model: one Identity node, one initializer."""
    arr = np.arange(6, dtype=np.float32).reshape(2, 3)
    blob = _model(
        [_node("Identity", ["a"], ["b"])], [_tensor("a", arr)], ["a"], ["b"]
    )
    import tempfile, os

    p = tempfile.mktemp(suffix=".onnx")
    with open(p, "wb") as f:
        f.write(blob)
    g = load_onnx_graph(p)
    os.unlink(p)
    assert [n.op_type for n in g.nodes] == ["Identity"]
    np.testing.assert_array_equal(g.initializers["a"], arr)
    assert g.inputs == []  # 'a' is an initializer, not a runtime input
    assert g.outputs == ["b"]


def test_executor_matches_torch_oracle(tmp_path):
    rng = np.random.default_rng(0)
    blob, x, oracle = _make_tdnn_onnx(rng)
    p = tmp_path / "tdnn.onnx"
    p.write_bytes(blob)
    m = OnnxModel(str(p))
    assert m.input_names == ["x"]
    (got,) = m.run({"x": x})
    want = oracle(x)
    np.testing.assert_allclose(got, want, atol=1e-4, rtol=1e-4)


def test_kaldi_fbank_properties():
    sr = 16000
    t = np.arange(sr) / sr
    tone = (0.5 * np.sin(2 * np.pi * 1000.0 * t)).astype(np.float32)
    feat = kaldi_fbank(tone)
    assert feat.shape == (1 + (sr - 400) // 160, 80)
    # The 1 kHz tone's energy peaks at the mel bin whose center is nearest
    # 1 kHz.
    banks = kaldi_mel_banks()
    freqs = np.arange(256) * (sr / 512)
    centers = (banks * freqs).sum(1) / np.maximum(banks.sum(1), 1e-9)
    peak_bin = int(np.argmax(feat.mean(0)))
    assert abs(centers[peak_bin] - 1000.0) < 120.0, centers[peak_bin]
    # Silence floors at log(eps).
    sil = kaldi_fbank(np.zeros(16000, np.float32))
    assert np.allclose(sil, np.log(1.1920928955078125e-07))


def test_sox_norm_peak():
    x = np.array([0.1, -0.9, 0.4], np.float32)
    y = sox_norm(x)
    assert abs(np.max(np.abs(y)) - 10 ** (-6 / 20)) < 1e-6
    assert sox_norm(np.zeros(4, np.float32)).sum() == 0


def test_campplus_gated_entry(tmp_path):
    assert CampplusXVector.maybe_from_dir(str(tmp_path)) is None
    rng = np.random.default_rng(1)
    blob, _, _ = _make_tdnn_onnx(rng)
    (tmp_path / "campplus.onnx").write_bytes(blob)
    xv = CampplusXVector.maybe_from_dir(str(tmp_path))
    assert xv is not None
    wav = (0.3 * rng.standard_normal(16000)).astype(np.float32)
    vec = xv.extract(wav)
    assert vec.shape == (8,)
    assert abs(np.linalg.norm(vec) - 1.0) < 1e-5


def test_kaldi_fbank_vs_direct_dft_oracle():
    """Independent slow oracle for the fbank (torchaudio is absent in this
    image — CLAUDE.md gap): per-frame Python loop, explicit DFT matrix, and
    mel filters built from bin EDGES on the mel axis (a different
    construction than the implementation's min(up, down) form). Catches
    off-by-ones in framing, preemphasis edge handling, window exponent, and
    filter placement that property tests can't see."""
    rng = np.random.default_rng(42)
    wav = (rng.standard_normal(16000 // 4) * 0.3).astype(np.float32)

    sr, flen, fshift, nfft, bins = 16000, 400, 160, 512, 80
    mel = lambda f: 1127.0 * np.log(1.0 + f / 700.0)  # noqa: E731
    # DFT basis, built independently of np.fft
    k = np.arange(nfft // 2)
    t_ = np.arange(nfft)
    cosm = np.cos(2 * np.pi * np.outer(k, t_) / nfft)
    sinm = np.sin(2 * np.pi * np.outer(k, t_) / nfft)
    # mel triangles from edge arrays
    edges = np.linspace(mel(20.0), mel(8000.0), bins + 2)
    bin_mels = mel(np.arange(nfft // 2) * sr / nfft)
    filt = np.zeros((bins, nfft // 2))
    for j in range(bins):
        lo, ce, hi = edges[j], edges[j + 1], edges[j + 2]
        for i, m in enumerate(bin_mels):
            if lo < m < ce:
                filt[j, i] = (m - lo) / (ce - lo)
            elif ce <= m < hi:
                filt[j, i] = (hi - m) / (hi - ce)

    n_frames = 1 + (len(wav) - flen) // fshift
    win = (0.5 - 0.5 * np.cos(2 * np.pi * np.arange(flen) / (flen - 1))) ** 0.85
    want = np.zeros((n_frames, bins))
    for f in range(n_frames):
        fr = wav[f * fshift : f * fshift + flen].astype(np.float64).copy()
        fr -= fr.mean()
        pre = np.empty_like(fr)
        pre[0] = fr[0] - 0.97 * fr[0]
        for i in range(1, flen):
            pre[i] = fr[i] - 0.97 * fr[i - 1]
        fr = pre * win
        frp = np.zeros(nfft)
        frp[:flen] = fr
        power = (cosm @ frp) ** 2 + (sinm @ frp) ** 2
        want[f] = np.log(np.maximum(filt @ power, 1.1920928955078125e-07))

    got = kaldi_fbank(wav)
    assert got.shape == want.shape
    np.testing.assert_allclose(got, want.astype(np.float32), rtol=2e-4,
                               atol=2e-4)


# ---------------------------------------------------------------------------
# Op-coverage matrix (VERDICT r3 item 9): every encoding variant a
# torch-exported D-TDNN-style graph may use, each checked against a torch
# oracle — so the real campplus.onnx is likely to run first try.
# ---------------------------------------------------------------------------

def _attr_s(name: str, v: bytes) -> bytes:
    return _ld(5, _ld(1, name.encode()) + _ld(4, v))


def _run_case(tmp_path, nodes, inits, inputs, outputs, feeds, want,
              atol=1e-4):
    blob = _model(nodes, inits, inputs, outputs)
    p = tmp_path / "case.onnx"
    p.write_bytes(blob)
    m = OnnxModel(str(p))
    got = m.run(feeds)
    for g, w in zip(got, want):
        np.testing.assert_allclose(g, np.asarray(w), atol=atol, rtol=1e-4)


def test_op_conv_autopad_same_upper(tmp_path):
    rng = np.random.default_rng(1)
    x = rng.standard_normal((1, 4, 19)).astype(np.float32)
    w = (rng.standard_normal((6, 4, 3)) / 3).astype(np.float32)
    want = torch.nn.functional.conv1d(
        torch.from_numpy(x), torch.from_numpy(w), padding="same").numpy()
    _run_case(
        tmp_path,
        [_node("Conv", ["x", "w"], ["y"], _attr_s("auto_pad", b"SAME_UPPER"))],
        [_tensor("w", w)], ["x", "w"], ["y"], {"x": x}, [want],
    )


def test_op_conv2d_pads_strides(tmp_path):
    rng = np.random.default_rng(2)
    x = rng.standard_normal((2, 3, 11, 9)).astype(np.float32)
    w = (rng.standard_normal((5, 3, 3, 3)) / 5).astype(np.float32)
    b = rng.standard_normal(5).astype(np.float32)
    want = torch.nn.functional.conv2d(
        torch.from_numpy(x), torch.from_numpy(w), torch.from_numpy(b),
        stride=(2, 1), padding=(1, 2)).numpy()
    _run_case(
        tmp_path,
        [_node("Conv", ["x", "w", "b"], ["y"],
               _attr_ints("pads", [1, 2, 1, 2]),
               _attr_ints("strides", [2, 1]))],
        [_tensor("w", w), _tensor("b", b)], ["x", "w", "b"], ["y"],
        {"x": x}, [want],
    )


def test_op_gemm_transpose_matrix(tmp_path):
    rng = np.random.default_rng(3)
    x = rng.standard_normal((3, 4)).astype(np.float32)
    wt = rng.standard_normal((5, 4)).astype(np.float32)   # transB layout
    c = rng.standard_normal(5).astype(np.float32)
    # transB=1 (the torch nn.Linear export form) + alpha/beta scaling
    want = 0.5 * (x @ wt.T) + 2.0 * c
    _run_case(
        tmp_path,
        [_node("Gemm", ["x", "w", "c"], ["y"],
               _attr_i("transB", 1), _attr_f("alpha", 0.5),
               _attr_f("beta", 2.0))],
        [_tensor("w", wt), _tensor("c", c)], ["x", "w", "c"], ["y"],
        {"x": x}, [want],
    )
    # transA=1
    xa = rng.standard_normal((4, 3)).astype(np.float32)
    wb = rng.standard_normal((4, 5)).astype(np.float32)
    want2 = xa.T @ wb
    _run_case(
        tmp_path,
        [_node("Gemm", ["x", "w"], ["y"], _attr_i("transA", 1))],
        [_tensor("w", wb)], ["x", "w"], ["y"], {"x": xa}, [want2],
    )


def test_op_pooling_variants(tmp_path):
    rng = np.random.default_rng(4)
    x = rng.standard_normal((1, 3, 17)).astype(np.float32)
    want = torch.nn.functional.max_pool1d(
        torch.from_numpy(x), 3, stride=2, padding=1).numpy()
    _run_case(
        tmp_path,
        [_node("MaxPool", ["x"], ["y"], _attr_ints("kernel_shape", [3]),
               _attr_ints("strides", [2]), _attr_ints("pads", [1, 1]))],
        [], ["x"], ["y"], {"x": x}, [want],
    )
    x2 = rng.standard_normal((1, 2, 8, 10)).astype(np.float32)
    # ONNX default count_include_pad=0 == torch count_include_pad=False
    want2 = torch.nn.functional.avg_pool2d(
        torch.from_numpy(x2), 3, stride=2, padding=1,
        count_include_pad=False).numpy()
    _run_case(
        tmp_path,
        [_node("AveragePool", ["x"], ["y"],
               _attr_ints("kernel_shape", [3, 3]),
               _attr_ints("strides", [2, 2]),
               _attr_ints("pads", [1, 1, 1, 1]))],
        [], ["x"], ["y"], {"x": x2}, [want2],
    )
    want3 = x2.mean(axis=(2, 3), keepdims=True)
    _run_case(tmp_path, [_node("GlobalAveragePool", ["x"], ["y"])],
              [], ["x"], ["y"], {"x": x2}, [want3])


def test_op_split_slice_concat(tmp_path):
    rng = np.random.default_rng(5)
    x = rng.standard_normal((2, 10, 4)).astype(np.float32)
    # Split (attr sizes) -> swap halves -> Concat; Slice with steps
    want_sw = np.concatenate([x[:, 6:], x[:, :6]], axis=1)
    _run_case(
        tmp_path,
        [_node("Split", ["x"], ["a", "b"], _attr_i("axis", 1),
               _attr_ints("split", [6, 4])),
         _node("Concat", ["b", "a"], ["y"], _attr_i("axis", 1))],
        [], ["x"], ["y"], {"x": x}, [want_sw],
    )
    starts = np.asarray([1], np.int64)
    ends = np.asarray([9], np.int64)
    axes = np.asarray([1], np.int64)
    steps = np.asarray([2], np.int64)
    want_sl = x[:, 1:9:2]
    _run_case(
        tmp_path,
        [_node("Slice", ["x", "st", "en", "ax", "sp"], ["y"])],
        [_tensor("st", starts), _tensor("en", ends), _tensor("ax", axes),
         _tensor("sp", steps)],
        ["x", "st", "en", "ax", "sp"], ["y"], {"x": x}, [want_sl],
    )


def test_op_activations_and_pad(tmp_path):
    rng = np.random.default_rng(6)
    x = rng.standard_normal((2, 3, 9)).astype(np.float32)
    slope = np.asarray([0.1, 0.2, 0.3], np.float32).reshape(3, 1)
    want = np.where(x > 0, x, slope[None] * x)
    _run_case(tmp_path, [_node("PRelu", ["x", "s"], ["y"])],
              [_tensor("s", slope)], ["x", "s"], ["y"], {"x": x}, [want])
    want2 = np.where(x > 0, x, 0.02 * x)
    _run_case(tmp_path,
              [_node("LeakyRelu", ["x"], ["y"], _attr_f("alpha", 0.02))],
              [], ["x"], ["y"], {"x": x}, [want2])
    pads = np.asarray([0, 0, 2, 0, 0, 3], np.int64)
    want3 = np.pad(x, [(0, 0), (0, 0), (2, 3)], mode="reflect")
    _run_case(
        tmp_path,
        [_node("Pad", ["x", "p"], ["y"], _attr_s("mode", b"reflect"))],
        [_tensor("p", pads)], ["x", "p"], ["y"], {"x": x}, [want3],
    )


def test_op_reduce_axes_as_input_opset13(tmp_path):
    rng = np.random.default_rng(7)
    x = rng.standard_normal((2, 5, 7)).astype(np.float32)
    axes = np.asarray([-1], np.int64)
    want = x.mean(axis=-1, keepdims=True)
    _run_case(
        tmp_path,
        [_node("ReduceMean", ["x", "ax"], ["y"])],
        [_tensor("ax", axes)], ["x", "ax"], ["y"], {"x": x}, [want],
    )
    want2 = np.sqrt((x * x).sum(axis=-1, keepdims=True))
    _run_case(
        tmp_path,
        [_node("ReduceL2", ["x", "ax"], ["y"])],
        [_tensor("ax", axes)], ["x", "ax"], ["y"], {"x": x}, [want2],
    )
