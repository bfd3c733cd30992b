"""Eager ONNX graph executor over JAX ops.

Covers the operator subset torch-exported speaker-verification nets use
(CAM++ / D-TDNN: Conv, BatchNormalization, Relu/Sigmoid, pooling, Gemm /
MatMul, shape plumbing). The reference runs ``campplus.onnx`` through
onnxruntime (vq/speech_vq.py:118-125); this executor runs the same graph
natively so the 25 Hz voice-clone encode path has no onnxruntime dependency.

Execution is eager (host-driven, one node at a time) — the x-vector is a
cold path hit once per clone-prompt creation; shape-computation chains
(Shape→Gather→Concat→Reshape) that torch exports emit evaluate on concrete
values, which is exactly what eager interpretation gives for free.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Sequence

import jax.numpy as jnp
import numpy as np
from jax import lax

from qwen_tts_tpu.io.onnx_graph import OnnxGraph, load_onnx_graph


def _conv(x, w, b, attrs):
    """Conv with groups/strides/dilations/pads (NCHW / NCW layouts)."""
    spatial = x.ndim - 2
    strides = tuple(attrs.get("strides", [1] * spatial))
    dilations = tuple(attrs.get("dilations", [1] * spatial))
    groups = int(attrs.get("group", 1))
    pads = attrs.get("pads")
    auto_pad = attrs.get("auto_pad", b"NOTSET")
    if isinstance(auto_pad, bytes):
        auto_pad = auto_pad.decode()
    if pads is not None:
        padding = [(int(pads[i]), int(pads[i + spatial]))
                   for i in range(spatial)]
    elif auto_pad in ("SAME_UPPER", "SAME_LOWER"):
        padding = "SAME"
    else:
        padding = [(0, 0)] * spatial
    dn = lax.conv_dimension_numbers(
        x.shape, w.shape,
        ("NCHW"[: 2 + spatial], "OIHW"[: 2 + spatial], "NCHW"[: 2 + spatial]),
    )
    out = lax.conv_general_dilated(
        x, w, window_strides=strides, padding=padding,
        rhs_dilation=dilations, dimension_numbers=dn,
        feature_group_count=groups,
    )
    if b is not None:
        out = out + b.reshape((1, -1) + (1,) * spatial)
    return out


def _pool(x, attrs, op):
    spatial = x.ndim - 2
    ks = tuple(attrs["kernel_shape"])
    strides = tuple(attrs.get("strides", [1] * spatial))
    pads = attrs.get("pads", [0] * (2 * spatial))
    padding = [(0, 0), (0, 0)] + [
        (int(pads[i]), int(pads[i + spatial])) for i in range(spatial)
    ]
    window = (1, 1) + ks
    strides = (1, 1) + strides
    if op == "MaxPool":
        return lax.reduce_window(x, -jnp.inf, lax.max, window, strides, padding)
    s = lax.reduce_window(x, 0.0, lax.add, window, strides, padding)
    ones = jnp.ones_like(x)
    n = lax.reduce_window(ones, 0.0, lax.add, window, strides, padding)
    return s / n


def _axes_arg(node, vals, attrs, idx=1):
    """axes as attribute (opset<13) or input tensor (opset>=13)."""
    if "axes" in attrs:
        return [int(a) for a in attrs["axes"]]
    if len(node.inputs) > idx and node.inputs[idx]:
        return [int(a) for a in np.asarray(vals[node.inputs[idx]])]
    return None


def run_graph(
    graph: OnnxGraph,
    feeds: Dict[str, np.ndarray],
    outputs: Optional[Sequence[str]] = None,
) -> List[np.ndarray]:
    vals: Dict[str, object] = {}
    vals.update({k: jnp.asarray(v) for k, v in graph.initializers.items()})
    for k, v in feeds.items():
        vals[k] = jnp.asarray(v)
    missing = [i for i in graph.inputs if i not in vals]
    if missing:
        raise ValueError(f"missing graph inputs: {missing}")

    def get(name):
        return vals[name] if name else None

    for node in graph.nodes:
        a = node.attrs
        i = [get(n) for n in node.inputs]
        op = node.op_type
        if op == "Conv":
            out = _conv(i[0], i[1], i[2] if len(i) > 2 else None, a)
        elif op == "BatchNormalization":
            x, scale, bias, mean, var = i[:5]
            eps = a.get("epsilon", 1e-5)
            shape = (1, -1) + (1,) * (x.ndim - 2)
            out = (x - mean.reshape(shape)) * (
                scale.reshape(shape) / jnp.sqrt(var.reshape(shape) + eps)
            ) + bias.reshape(shape)
        elif op == "Relu":
            out = jnp.maximum(i[0], 0)
        elif op == "Sigmoid":
            out = 1.0 / (1.0 + jnp.exp(-i[0]))
        elif op == "Tanh":
            out = jnp.tanh(i[0])
        elif op == "Softmax":
            out = jnp.exp(i[0] - jnp.max(i[0], axis=int(a.get("axis", -1)),
                                         keepdims=True))
            out = out / jnp.sum(out, axis=int(a.get("axis", -1)), keepdims=True)
        elif op == "Add":
            out = i[0] + i[1]
        elif op == "Sub":
            out = i[0] - i[1]
        elif op == "Mul":
            out = i[0] * i[1]
        elif op == "Div":
            out = i[0] / i[1]
        elif op == "Pow":
            out = i[0] ** i[1]
        elif op == "Sqrt":
            out = jnp.sqrt(i[0])
        elif op == "Neg":
            out = -i[0]
        elif op == "Exp":
            out = jnp.exp(i[0])
        elif op == "Clip":
            lo = i[1] if len(i) > 1 and i[1] is not None else a.get("min")
            hi = i[2] if len(i) > 2 and i[2] is not None else a.get("max")
            out = jnp.clip(i[0], lo, hi)
        elif op == "MatMul":
            out = i[0] @ i[1]
        elif op == "Gemm":
            x, w = i[0], i[1]
            if a.get("transA", 0):
                x = x.T
            if a.get("transB", 0):
                w = w.T
            out = a.get("alpha", 1.0) * (x @ w)
            if len(i) > 2 and i[2] is not None:
                out = out + a.get("beta", 1.0) * i[2]
        elif op == "Concat":
            out = jnp.concatenate([t for t in i], axis=int(a["axis"]))
        elif op == "Split":
            axis = int(a.get("axis", 0))
            if len(i) > 1 and i[1] is not None:
                sizes = [int(s) for s in np.asarray(i[1])]
            else:
                sizes = a.get("split")
            if sizes is None:
                n_out = len(node.outputs)
                sizes = [i[0].shape[axis] // n_out] * n_out
            pieces = []
            start = 0
            for s in sizes:
                idx = [slice(None)] * i[0].ndim
                idx[axis] = slice(start, start + s)
                pieces.append(i[0][tuple(idx)])
                start += s
            for nm, piece in zip(node.outputs, pieces):
                vals[nm] = piece
            continue
        elif op == "Reshape":
            shape = [int(s) for s in np.asarray(i[1])]
            shape = [i[0].shape[k] if s == 0 else s for k, s in enumerate(shape)]
            out = jnp.reshape(i[0], shape)
        elif op == "Transpose":
            perm = a.get("perm")
            out = jnp.transpose(i[0], perm)
        elif op == "Flatten":
            ax = int(a.get("axis", 1))
            out = jnp.reshape(i[0], (int(np.prod(i[0].shape[:ax])), -1))
        elif op == "Unsqueeze":
            axes = _axes_arg(node, vals, a)
            out = i[0]
            for ax in sorted(axes):
                out = jnp.expand_dims(out, ax)
        elif op == "Squeeze":
            axes = _axes_arg(node, vals, a)
            out = jnp.squeeze(i[0], axis=tuple(axes) if axes else None)
        elif op == "Shape":
            out = jnp.asarray(np.asarray(i[0].shape, np.int64))
        elif op == "Gather":
            out = jnp.take(i[0], i[1].astype(jnp.int32),
                           axis=int(a.get("axis", 0)))
        elif op == "Slice":
            if len(i) > 1:  # opset >= 10: starts/ends/axes/steps as inputs
                starts = [int(v) for v in np.asarray(i[1])]
                ends = [int(v) for v in np.asarray(i[2])]
                axes = ([int(v) for v in np.asarray(i[3])]
                        if len(i) > 3 and i[3] is not None
                        else list(range(len(starts))))
                steps = ([int(v) for v in np.asarray(i[4])]
                         if len(i) > 4 and i[4] is not None
                         else [1] * len(starts))
            else:
                starts = [int(v) for v in a["starts"]]
                ends = [int(v) for v in a["ends"]]
                axes = [int(v) for v in a.get("axes",
                                              range(len(starts)))]
                steps = [1] * len(starts)
            idx = [slice(None)] * i[0].ndim
            for ax, st, en, sp in zip(axes, starts, ends, steps):
                idx[ax] = slice(st, en, sp)
            out = i[0][tuple(idx)]
        elif op in ("ReduceMean", "ReduceSum", "ReduceMax", "ReduceMin"):
            axes = _axes_arg(node, vals, a)
            keep = bool(a.get("keepdims", 1))
            fn = {"ReduceMean": jnp.mean, "ReduceSum": jnp.sum,
                  "ReduceMax": jnp.max, "ReduceMin": jnp.min}[op]
            out = fn(i[0], axis=tuple(axes) if axes else None, keepdims=keep)
        elif op == "GlobalAveragePool":
            out = jnp.mean(i[0], axis=tuple(range(2, i[0].ndim)),
                           keepdims=True)
        elif op in ("MaxPool", "AveragePool"):
            out = _pool(i[0], a, op)
        elif op == "Cast":
            to = int(a["to"])
            from qwen_tts_tpu.io.onnx_graph import _DTYPES

            out = i[0].astype(_DTYPES[to])
        elif op == "Constant":
            out = jnp.asarray(a["value"])
        elif op == "ConstantOfShape":
            shape = [int(s) for s in np.asarray(i[0])]
            fill = a.get("value")
            out = jnp.full(shape, fill.ravel()[0] if fill is not None else 0.0)
        elif op == "Expand":
            out = jnp.broadcast_to(
                i[0], np.broadcast_shapes(
                    tuple(int(s) for s in np.asarray(i[1])), i[0].shape
                )
            )
        elif op == "Range":
            out = jnp.arange(int(np.asarray(i[0])), int(np.asarray(i[1])),
                             int(np.asarray(i[2])))
        elif op == "Identity":
            out = i[0]
        elif op == "Erf":
            from jax.scipy.special import erf

            out = erf(i[0])
        elif op == "LeakyRelu":
            alpha = a.get("alpha", 0.01)
            out = jnp.where(i[0] > 0, i[0], alpha * i[0])
        elif op == "PRelu":
            out = jnp.where(i[0] > 0, i[0], i[1] * i[0])
        elif op == "Where":
            out = jnp.where(i[0], i[1], i[2])
        elif op == "Equal":
            out = i[0] == i[1]
        elif op == "Pad":
            mode = a.get("mode", b"constant")
            if isinstance(mode, bytes):
                mode = mode.decode()
            pads = ([int(v) for v in np.asarray(i[1])] if len(i) > 1
                    else [int(v) for v in a["pads"]])
            nd = i[0].ndim
            pad_width = [(pads[k], pads[k + nd]) for k in range(nd)]
            out = jnp.pad(i[0], pad_width,
                          mode={"constant": "constant", "reflect": "reflect",
                                "edge": "edge"}[mode])
        elif op == "ReduceL2":
            axes = _axes_arg(node, vals, a)
            keep = bool(a.get("keepdims", 1))
            out = jnp.sqrt(jnp.sum(i[0] * i[0],
                                   axis=tuple(axes) if axes else None,
                                   keepdims=keep))
        else:
            raise NotImplementedError(
                f"ONNX op {op!r} (node {node.name!r}) not supported by the "
                "native executor"
            )
        vals[node.outputs[0]] = out

    names = list(outputs) if outputs else graph.outputs
    return [np.asarray(vals[n]) for n in names]


class OnnxModel:
    """Loaded ONNX graph with a session-like run() interface."""

    def __init__(self, path: str):
        self.graph = load_onnx_graph(path)
        self.input_names = self.graph.inputs
        self.output_names = self.graph.outputs

    def run(self, feeds: Dict[str, np.ndarray],
            outputs: Optional[Sequence[str]] = None) -> List[np.ndarray]:
        return run_graph(self.graph, feeds, outputs)
