"""Minimal pure-numpy ONNX inference — real `.onnx` files without
onnxruntime.

The reference scores events through `ort` (runtime/src/scoring.rs:10-97,
feature `scoring`; a stub raises otherwise, :100-120). This container has
no onnxruntime, so instead of stopping at a stub this module implements the
slice of ONNX an event-scoring MLP actually needs:

- a generic protobuf wire-format reader (varint / 64-bit / length-delimited
  / 32-bit — the public protobuf encoding, developers.google.com/
  protocol-buffers/docs/encoding),
- the ONNX message schema for ModelProto/GraphProto/NodeProto/TensorProto/
  AttributeProto (field numbers from the public onnx.proto3),
- a topological executor over a practical op subset:
  dense: MatMul, Gemm, Add, Sub, Mul, Div, Relu, LeakyRelu, Sigmoid,
  Tanh, Softmax, Exp, Log, Sqrt, Neg, Pow, Flatten, Identity, Constant,
  Cast, Clip;
  shape: Reshape, Transpose, Concat, Squeeze, Unsqueeze, ReduceMean;
  conv-net (r5): Conv (strides/pads/dilations/groups via im2col stride
  tricks), MaxPool, AveragePool (count_include_pad honored),
  GlobalAveragePool, GlobalMaxPool, BatchNormalization;
  recurrent (r5): LSTM (single-layer forward, ONNX i,o,f,c gate order,
  multi-output Y/Y_h/Y_c);
  attention (r6): LayerNormalization (opset-17 form) — with MatMul /
  Softmax / Transpose already present this runs a full scaled-dot-product
  self-attention block (see make_attention_onnx); Erf / Gelu (exact +
  tanh-approximate) / ReduceSum for transformer FFNs; Gather / Slice /
  Split / Where / Expand / Shape / Equal / Greater / Less so real
  exported graphs (QKV splits, embedding lookups, masking) load too.
  Anything else raises NotImplementedError naming the op.

Optional inputs bind POSITIONALLY: ONNX omits an optional input with an
empty name, so the input list is materialized with None placeholders and
every op guards its optional slots — a compacted list would silently shift
h0/c0 into the B/sequence_lens slots of an LSTM that skips B.

`score()` (operators/score.py) prefers onnxruntime when installed and
falls back here, so the same `.onnx` artifact works in both environments.

Scoring batches stay inside one Arrow batch on one executor — the model
weights broadcast with the closure; nothing here crosses a shuffle.
"""

from __future__ import annotations

import struct
from typing import Iterator

import numpy as np

# -- protobuf wire format ----------------------------------------------------


def _read_varint(buf: bytes, i: int) -> tuple[int, int]:
    shift = 0
    val = 0
    while True:
        b = buf[i]
        i += 1
        val |= (b & 0x7F) << shift
        if not b & 0x80:
            return val, i
        shift += 7


def parse_message(buf: bytes) -> dict[int, list]:
    """Decode one protobuf message into {field_number: [raw values]}.
    Length-delimited fields stay as bytes (caller interprets: nested
    message, string, or packed scalars)."""
    out: dict[int, list] = {}
    i = 0
    n = len(buf)
    while i < n:
        tag, i = _read_varint(buf, i)
        field, wire = tag >> 3, tag & 7
        if wire == 0:
            v, i = _read_varint(buf, i)
        elif wire == 1:
            v = buf[i:i + 8]
            i += 8
        elif wire == 2:
            ln, i = _read_varint(buf, i)
            v = buf[i:i + ln]
            i += ln
        elif wire == 5:
            v = buf[i:i + 4]
            i += 4
        else:
            raise ValueError(f"unsupported protobuf wire type {wire}")
        out.setdefault(field, []).append(v)
    return out


def _packed_or_repeated_varints(vals: list) -> list[int]:
    """A repeated int field arrives either packed (one bytes blob) or as
    separate varint entries."""
    out: list[int] = []
    for v in vals:
        if isinstance(v, bytes):
            i = 0
            while i < len(v):
                x, i = _read_varint(v, i)
                out.append(x)
        else:
            out.append(v)
    return out


def _signed(v: int) -> int:
    """Protobuf int64 fields are two's-complement varints."""
    return v - (1 << 64) if v >= (1 << 63) else v


# -- ONNX schema (field numbers from the public onnx.proto3) -----------------

FLOAT, INT64, DOUBLE, INT32 = 1, 7, 11, 6  # TensorProto.DataType


def _parse_tensor(buf: bytes) -> tuple[str, np.ndarray]:
    t = parse_message(buf)
    dims = [_signed(d) for d in _packed_or_repeated_varints(t.get(1, []))]
    dtype = _packed_or_repeated_varints(t.get(2, [0]))[0]
    name = t.get(8, [b""])[0].decode()
    if 9 in t:  # raw_data: little-endian per data_type
        raw = b"".join(t[9])
        if dtype == FLOAT:
            arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
        elif dtype == DOUBLE:
            arr = np.frombuffer(raw, dtype="<f8")
        elif dtype == INT64:
            arr = np.frombuffer(raw, dtype="<i8").astype(np.float64)
        elif dtype == INT32:
            arr = np.frombuffer(raw, dtype="<i4").astype(np.float64)
        else:
            raise NotImplementedError(f"ONNX tensor data_type {dtype}")
    elif 4 in t:  # float_data (packed fixed32)
        raw = b"".join(t[4])
        arr = np.frombuffer(raw, dtype="<f4").astype(np.float64)
    elif 13 in t:  # double_data
        raw = b"".join(t[13])
        arr = np.frombuffer(raw, dtype="<f8")
    elif 7 in t:  # int64_data (packed varints)
        arr = np.array(
            [_signed(x) for x in _packed_or_repeated_varints(t[7])],
            dtype=np.float64,
        )
    else:
        arr = np.zeros(0)
    return name, arr.reshape(dims) if dims else arr


def _parse_attributes(bufs: list) -> dict[str, object]:
    attrs: dict[str, object] = {}
    for buf in bufs:
        a = parse_message(buf)
        name = a.get(1, [b""])[0].decode()
        if 2 in a:  # f (fixed32 float)
            attrs[name] = struct.unpack("<f", a[2][0])[0]
        elif 3 in a:  # i
            attrs[name] = _signed(_packed_or_repeated_varints(a[3])[0])
        elif 4 in a:  # s
            attrs[name] = a[4][0].decode(errors="replace")
        elif 5 in a:  # t (tensor)
            attrs[name] = _parse_tensor(a[5][0])[1]
        elif 7 in a:  # floats
            attrs[name] = list(np.frombuffer(b"".join(a[7]), dtype="<f4"))
        elif 8 in a:  # ints
            attrs[name] = [_signed(x) for x in _packed_or_repeated_varints(a[8])]
    return attrs


class MiniOnnxModel:
    """Parsed graph ready for batch inference."""

    def __init__(self, data: bytes):
        model = parse_message(data)
        if 7 not in model:
            raise ValueError("not an ONNX ModelProto (no graph field)")
        g = parse_message(model[7][0])
        self.initializers: dict[str, np.ndarray] = {}
        for tb in g.get(5, []):
            name, arr = _parse_tensor(tb)
            self.initializers[name] = arr
        self.nodes = []
        for nb in g.get(1, []):
            nd = parse_message(nb)
            self.nodes.append({
                "inputs": [x.decode() for x in nd.get(1, [])],
                "outputs": [x.decode() for x in nd.get(2, [])],
                "op": nd.get(4, [b""])[0].decode(),
                "attrs": _parse_attributes(nd.get(5, [])),
            })
        def _names(field):
            out = []
            for vb in g.get(field, []):
                vi = parse_message(vb)
                out.append(vi.get(1, [b""])[0].decode())
            return out
        self.graph_inputs = [
            n for n in _names(11) if n not in self.initializers
        ]
        self.graph_outputs = _names(12)

    # -- execution --------------------------------------------------------
    def run(self, feeds: dict[str, np.ndarray]) -> list[np.ndarray]:
        env: dict[str, np.ndarray] = dict(self.initializers)
        env.update({k: np.asarray(v, dtype=np.float64) for k, v in feeds.items()})
        for nd in self.nodes:
            op, ins, outs, attrs = (nd["op"], nd["inputs"], nd["outputs"],
                                    nd["attrs"])
            # positional binding with None placeholders: ONNX omits optional
            # inputs via empty names, so x[k] must stay aligned with the op
            # spec's input slots (a compacted list silently shifts h0/c0
            # into the B/sequence_lens slots for e.g. an LSTM that skips B)
            x = [env[i] if i else None for i in ins]
            if op == "MatMul":
                r = x[0] @ x[1]
            elif op == "Gemm":
                a, b = x[0], x[1]
                if attrs.get("transA", 0):
                    a = a.T
                if attrs.get("transB", 0):
                    b = b.T
                r = attrs.get("alpha", 1.0) * (a @ b)
                if len(x) > 2 and x[2] is not None:
                    r = r + attrs.get("beta", 1.0) * x[2]
            elif op == "Add":
                r = x[0] + x[1]
            elif op == "Sub":
                r = x[0] - x[1]
            elif op == "Mul":
                r = x[0] * x[1]
            elif op == "Div":
                r = x[0] / x[1]
            elif op == "Relu":
                r = np.maximum(x[0], 0.0)
            elif op == "Sigmoid":
                r = 1.0 / (1.0 + np.exp(-x[0]))
            elif op == "Tanh":
                r = np.tanh(x[0])
            elif op == "Softmax":
                ax = attrs.get("axis", -1)
                e = np.exp(x[0] - np.max(x[0], axis=ax, keepdims=True))
                r = e / np.sum(e, axis=ax, keepdims=True)
            elif op == "Flatten":
                ax = attrs.get("axis", 1)
                lead = int(np.prod(x[0].shape[:ax])) if ax else 1
                r = x[0].reshape(lead, -1)
            elif op in ("Identity", "Cast"):
                r = x[0]  # all numerics run as float64 here
            elif op == "Constant":
                r = np.asarray(attrs["value"], dtype=np.float64)
            elif op == "Clip":
                lo = x[1] if len(x) > 1 and x[1] is not None else attrs.get("min", -np.inf)
                hi = x[2] if len(x) > 2 and x[2] is not None else attrs.get("max", np.inf)
                r = np.clip(x[0], lo, hi)
            elif op == "LeakyRelu":
                alpha = attrs.get("alpha", 0.01)
                r = np.where(x[0] > 0, x[0], alpha * x[0])
            elif op == "Exp":
                r = np.exp(x[0])
            elif op == "Log":
                r = np.log(x[0])
            elif op == "Sqrt":
                r = np.sqrt(x[0])
            elif op == "Neg":
                r = -x[0]
            elif op == "Pow":
                r = x[0] ** x[1]
            elif op == "Reshape":
                shape = [int(s) for s in np.asarray(x[1]).ravel()]
                shape = [
                    x[0].shape[i] if s == 0 else s for i, s in enumerate(shape)
                ]
                r = x[0].reshape(shape)
            elif op == "Transpose":
                perm = attrs.get("perm")
                r = np.transpose(x[0], perm)
            elif op == "Concat":
                r = np.concatenate(x, axis=attrs.get("axis", 0))
            elif op == "Squeeze":
                axes = [int(a) for a in np.asarray(
                    x[1] if len(x) > 1 and x[1] is not None
                    else attrs.get("axes", [])).ravel()]
                r = np.squeeze(x[0], axis=tuple(axes) if axes else None)
            elif op == "Unsqueeze":
                axes = [int(a) for a in np.asarray(
                    x[1] if len(x) > 1 and x[1] is not None
                    else attrs["axes"]).ravel()]
                r = x[0]
                for a in sorted(axes):
                    r = np.expand_dims(r, a)
            elif op in ("ReduceMean", "ReduceSum"):
                axes = attrs.get("axes")
                if axes is None and len(x) > 1 and x[1] is not None:
                    axes = [int(a) for a in np.asarray(x[1]).ravel()]
                fn = np.mean if op == "ReduceMean" else np.sum
                r = fn(
                    x[0],
                    axis=tuple(axes) if axes else None,
                    keepdims=bool(attrs.get("keepdims", 1)),
                )
            elif op == "Erf":
                r = _erf(x[0])
            elif op == "Gather":
                idx = np.asarray(x[1]).astype(np.int64)
                r = np.take(x[0], idx, axis=int(attrs.get("axis", 0)))
            elif op == "Slice":
                starts = np.asarray(x[1]).astype(np.int64).ravel()
                ends = np.asarray(x[2]).astype(np.int64).ravel()
                axes = (
                    np.asarray(x[3]).astype(np.int64).ravel()
                    if len(x) > 3 and x[3] is not None
                    else np.arange(len(starts))
                )
                steps = (
                    np.asarray(x[4]).astype(np.int64).ravel()
                    if len(x) > 4 and x[4] is not None
                    else np.ones(len(starts), dtype=np.int64)
                )
                sl = [slice(None)] * x[0].ndim
                for s, e, ax, st in zip(starts, ends, axes, steps):
                    sl[int(ax)] = slice(int(s), int(e), int(st))
                r = x[0][tuple(sl)]
            elif op == "Split":
                ax = int(attrs.get("axis", 0))
                if len(x) > 1 and x[1] is not None:
                    sizes = [int(v) for v in np.asarray(x[1]).ravel()]
                elif "split" in attrs:
                    sizes = [int(v) for v in attrs["split"]]
                else:
                    n_out = int(attrs.get("num_outputs", len(outs)))
                    base = x[0].shape[ax] // n_out
                    sizes = [base] * n_out
                    sizes[-1] += x[0].shape[ax] - base * n_out
                r = tuple(np.split(x[0], np.cumsum(sizes)[:-1], axis=ax))
            elif op == "Where":
                r = np.where(x[0].astype(bool), x[1], x[2])
            elif op == "Expand":
                shape = [int(s) for s in np.asarray(x[1]).ravel()]
                r = np.broadcast_to(
                    x[0], np.broadcast_shapes(x[0].shape, tuple(shape))
                ).copy()
            elif op == "Shape":
                r = np.asarray(x[0].shape, dtype=np.float64)
            elif op in ("Equal", "Greater", "Less"):
                fn = {"Equal": np.equal, "Greater": np.greater, "Less": np.less}[op]
                r = fn(x[0], x[1]).astype(np.float64)
            elif op == "Gelu":
                # opset-20 Gelu: exact erf form, or tanh approximation
                if attrs.get("approximate", "none") == "tanh":
                    r = 0.5 * x[0] * (1.0 + np.tanh(
                        np.sqrt(2.0 / np.pi) * (x[0] + 0.044715 * x[0] ** 3)))
                else:
                    r = 0.5 * x[0] * (1.0 + _erf(x[0] / np.sqrt(2.0)))
            elif op == "BatchNormalization":
                # X, scale, B, mean, var — channel axis 1
                eps = attrs.get("epsilon", 1e-5)
                shape = [1, -1] + [1] * (x[0].ndim - 2)
                r = (
                    (x[0] - x[3].reshape(shape))
                    / np.sqrt(x[4].reshape(shape) + eps)
                    * x[1].reshape(shape)
                    + x[2].reshape(shape)
                )
            elif op == "Conv":
                r = _conv2d(
                    x[0], x[1], x[2] if len(x) > 2 else None,
                    strides=attrs.get("strides", [1, 1]),
                    pads=attrs.get("pads", [0, 0, 0, 0]),
                    dilations=attrs.get("dilations", [1, 1]),
                    group=attrs.get("group", 1),
                )
            elif op in ("MaxPool", "AveragePool"):
                r = _pool2d(
                    x[0],
                    kernel=attrs["kernel_shape"],
                    strides=attrs.get("strides", [1, 1]),
                    pads=attrs.get("pads", [0, 0, 0, 0]),
                    mode="max" if op == "MaxPool" else "avg",
                    count_include_pad=bool(attrs.get("count_include_pad", 0)),
                )
            elif op == "GlobalAveragePool":
                r = np.mean(x[0], axis=(2, 3), keepdims=True)
            elif op == "GlobalMaxPool":
                r = np.max(x[0], axis=(2, 3), keepdims=True)
            elif op == "LSTM":
                r = _lstm(
                    x[0], x[1], x[2],
                    B=x[3] if len(x) > 3 else None,
                    h0=x[5] if len(x) > 5 else None,
                    c0=x[6] if len(x) > 6 else None,
                    hidden=attrs.get("hidden_size"),
                    direction=attrs.get("direction", "forward"),
                )
            elif op == "LayerNormalization":
                # normalize over [axis .. rank): the transformer residual
                # norm (public ONNX spec, opset 17); optional bias input
                ax = int(attrs.get("axis", -1)) % x[0].ndim
                eps = attrs.get("epsilon", 1e-5)
                axes = tuple(range(ax, x[0].ndim))
                mu = np.mean(x[0], axis=axes, keepdims=True)
                var = np.mean((x[0] - mu) ** 2, axis=axes, keepdims=True)
                r = (x[0] - mu) / np.sqrt(var + eps)
                if len(x) > 1 and x[1] is not None:
                    r = r * x[1]
                if len(x) > 2 and x[2] is not None:
                    r = r + x[2]
            else:
                raise NotImplementedError(
                    f"ONNX op '{op}' is outside the mini-runtime subset; "
                    "install onnxruntime for full coverage"
                )
            if isinstance(r, tuple):
                for o, v in zip(outs, r):
                    if o:
                        env[o] = v
            else:
                env[outs[0]] = r
        return [env[o] for o in self.graph_outputs]


def _erf(a: np.ndarray) -> np.ndarray:
    """Double-precision erf without scipy: stdlib math.erf vectorized.
    Scoring batches are thousands of rows — per-element C-call cost is
    acceptable; replace with scipy.special.erf if available."""
    import math

    try:
        from scipy.special import erf as _serf  # pragma: no cover

        return _serf(a)
    except ImportError:
        return np.frompyfunc(math.erf, 1, 1)(np.asarray(a, dtype=np.float64)).astype(np.float64)


# -- conv-net / recurrent kernels (public ONNX operator specs) ---------------


def _conv2d(X, W, B, strides, pads, dilations, group):
    """Conv (2-D, NCHW): im2col view via stride tricks + grouped einsum.
    pads is ONNX order [top, left, bottom, right]."""
    N, C, H, Wd = X.shape
    M, Cg, kH, kW = W.shape
    sh, sw = (int(s) for s in strides)
    dh, dw = (int(d) for d in dilations)
    pt, pl, pb, pr = (int(p) for p in pads)
    Xp = np.pad(X, ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    Ho = (Xp.shape[2] - (dh * (kH - 1) + 1)) // sh + 1
    Wo = (Xp.shape[3] - (dw * (kW - 1) + 1)) // sw + 1
    s = Xp.strides
    cols = np.lib.stride_tricks.as_strided(
        Xp,
        (N, C, Ho, Wo, kH, kW),
        (s[0], s[1], s[2] * sh, s[3] * sw, s[2] * dh, s[3] * dw),
    )
    out = np.empty((N, M, Ho, Wo), dtype=np.float64)
    Mg = M // int(group)
    for g in range(int(group)):
        cg = cols[:, g * Cg:(g + 1) * Cg]
        wg = W[g * Mg:(g + 1) * Mg]
        out[:, g * Mg:(g + 1) * Mg] = np.einsum(
            "nchwkl,mckl->nmhw", cg, wg, optimize=True
        )
    if B is not None:
        out += B.reshape(1, M, 1, 1)
    return out


def _pool2d(X, kernel, strides, pads, mode, count_include_pad):
    kH, kW = (int(k) for k in kernel)
    sh, sw = (int(s) for s in strides)
    pt, pl, pb, pr = (int(p) for p in pads)
    fill = -np.inf if mode == "max" else 0.0
    Xp = np.pad(X, ((0, 0), (0, 0), (pt, pb), (pl, pr)),
                constant_values=fill)
    Ho = (Xp.shape[2] - kH) // sh + 1
    Wo = (Xp.shape[3] - kW) // sw + 1
    s = Xp.strides
    win = np.lib.stride_tricks.as_strided(
        Xp,
        (X.shape[0], X.shape[1], Ho, Wo, kH, kW),
        (s[0], s[1], s[2] * sh, s[3] * sw, s[2], s[3]),
    )
    if mode == "max":
        return win.max(axis=(4, 5))
    if count_include_pad:
        return win.mean(axis=(4, 5))
    # exclude pad: divide by the true window overlap with the input
    ones = np.pad(np.ones_like(X[:1, :1]), ((0, 0), (0, 0), (pt, pb), (pl, pr)))
    cnt = np.lib.stride_tricks.as_strided(
        ones,
        (1, 1, Ho, Wo, kH, kW),
        (ones.strides[0], ones.strides[1], ones.strides[2] * sh,
         ones.strides[3] * sw, ones.strides[2], ones.strides[3]),
    ).sum(axis=(4, 5))
    return win.sum(axis=(4, 5)) / cnt


def _lstm(X, W, R, B=None, h0=None, c0=None, hidden=None, direction="forward"):
    """LSTM forward pass (single direction), ONNX gate order i,o,f,c.
    X: (seq, batch, input); W: (1, 4H, input); R: (1, 4H, H); B: (1, 8H).
    Returns (Y (seq,1,batch,H), Y_h (1,batch,H), Y_c (1,batch,H))."""
    if direction != "forward":
        raise NotImplementedError(
            "mini-runtime LSTM supports direction='forward' only"
        )
    W2, R2 = W[0], R[0]
    H = R2.shape[1] if hidden is None else int(hidden)
    seq, batch, _ = X.shape
    b = B[0] if B is not None else np.zeros(8 * H)
    bias = b[: 4 * H] + b[4 * H:]
    h = h0[0] if h0 is not None else np.zeros((batch, H))
    c = c0[0] if c0 is not None else np.zeros((batch, H))

    def sig(v):
        return 1.0 / (1.0 + np.exp(-v))

    ys = []
    for t in range(seq):
        gates = X[t] @ W2.T + h @ R2.T + bias
        gi, go, gf, gc = (gates[:, k * H:(k + 1) * H] for k in range(4))
        i, o, f, g = sig(gi), sig(go), sig(gf), np.tanh(gc)
        c = f * c + i * g
        h = o * np.tanh(c)
        ys.append(h)
    Y = np.stack(ys)[:, None]
    return Y, h[None], c[None]


def load_model(path_or_bytes) -> MiniOnnxModel:
    if isinstance(path_or_bytes, (bytes, bytearray)):
        return MiniOnnxModel(bytes(path_or_bytes))
    with open(path_or_bytes, "rb") as f:
        return MiniOnnxModel(f.read())


# -- fixture encoder ---------------------------------------------------------
# A minimal protobuf WRITER so tests (and users without the onnx package)
# can produce a valid single-hidden-layer MLP .onnx artifact.


def _varint(v: int) -> bytes:
    out = bytearray()
    while True:
        b = v & 0x7F
        v >>= 7
        if v:
            out.append(b | 0x80)
        else:
            out.append(b)
            return bytes(out)


def _field(num: int, wire: int, payload: bytes) -> bytes:
    return _varint(num << 3 | wire) + payload


def _ld(num: int, payload: bytes) -> bytes:  # length-delimited
    return _field(num, 2, _varint(len(payload)) + payload)


def _tensor(name: str, arr: np.ndarray) -> bytes:
    body = b"".join(_field(1, 0, _varint(d)) for d in arr.shape)
    body += _field(2, 0, _varint(FLOAT))
    body += _ld(8, name.encode())
    body += _ld(9, arr.astype("<f4").tobytes())
    return body


def _node(op: str, inputs: list[str], outputs: list[str],
          attrs: dict | None = None) -> bytes:
    body = b"".join(_ld(1, i.encode()) for i in inputs)
    body += b"".join(_ld(2, o.encode()) for o in outputs)
    body += _ld(4, op.encode())
    for name, val in (attrs or {}).items():
        a = _ld(1, name.encode())
        if isinstance(val, float):
            a += _field(2, 5, struct.pack("<f", val)) + _field(20, 0, _varint(1))
        elif isinstance(val, (list, tuple)):  # INTS
            a += b"".join(
                _field(8, 0, _varint(int(v) & (1 << 64) - 1)) for v in val
            ) + _field(20, 0, _varint(7))
        elif isinstance(val, str):
            a += _ld(4, val.encode()) + _field(20, 0, _varint(3))
        else:
            a += _field(3, 0, _varint(val & (1 << 64) - 1)) + _field(20, 0, _varint(2))
        body += _ld(5, a)
    return body


def _value_info(name: str) -> bytes:
    return _ld(1, name.encode())


def make_mlp_onnx(
    w1: np.ndarray, b1: np.ndarray, w2: np.ndarray, b2: np.ndarray,
    activation: str = "Relu", out_activation: str | None = "Sigmoid",
) -> bytes:
    """Serialize x @ w1 + b1 → act → @ w2 + b2 [→ out_act] as a valid ONNX
    ModelProto (input 'x', output 'y')."""
    nodes = [
        _node("MatMul", ["x", "w1"], ["h0"]),
        _node("Add", ["h0", "b1"], ["h1"]),
        _node(activation, ["h1"], ["h2"]),
        _node("MatMul", ["h2", "w2"], ["o0"]),
        _node("Add", ["o0", "b2"], ["o1" if out_activation else "y"]),
    ]
    if out_activation:
        nodes.append(_node(out_activation, ["o1"], ["y"]))
    graph = b"".join(_ld(1, n) for n in nodes)
    for name, arr in (("w1", w1), ("b1", b1), ("w2", w2), ("b2", b2)):
        graph += _ld(5, _tensor(name, np.asarray(arr)))
    graph += _ld(2, b"mini_mlp")
    graph += _ld(11, _value_info("x"))
    graph += _ld(12, _value_info("y"))
    model = _field(1, 0, _varint(8))  # ir_version
    model += _ld(7, graph)
    return model


def _graph_to_model(nodes: list[bytes], inits: dict, name: bytes,
                    in_names: list[str], out_names: list[str]) -> bytes:
    graph = b"".join(_ld(1, n) for n in nodes)
    for nm, arr in inits.items():
        graph += _ld(5, _tensor(nm, np.asarray(arr)))
    graph += _ld(2, name)
    for n in in_names:
        graph += _ld(11, _value_info(n))
    for n in out_names:
        graph += _ld(12, _value_info(n))
    return _field(1, 0, _varint(8)) + _ld(7, graph)


def make_conv_onnx(
    conv_w: np.ndarray, conv_b: np.ndarray, fc_w: np.ndarray,
    fc_b: np.ndarray, strides=(1, 1), pads=(0, 0, 0, 0), pool=(2, 2),
) -> bytes:
    """Small conv-net: Conv → Relu → MaxPool → Flatten → Gemm → Sigmoid
    (input 'x' NCHW, output 'y') — exercises the r5 conv/pool op family."""
    nodes = [
        _node("Conv", ["x", "cw", "cb"], ["c0"], {
            "strides": list(strides), "pads": list(pads),
            "kernel_shape": [conv_w.shape[2], conv_w.shape[3]],
        }),
        _node("Relu", ["c0"], ["c1"]),
        _node("MaxPool", ["c1"], ["p0"], {
            "kernel_shape": list(pool), "strides": list(pool),
        }),
        _node("Flatten", ["p0"], ["f0"], {"axis": 1}),
        _node("Gemm", ["f0", "fw", "fb"], ["g0"], {"transB": 1}),
        _node("Sigmoid", ["g0"], ["y"]),
    ]
    inits = {"cw": conv_w, "cb": conv_b, "fw": fc_w, "fb": fc_b}
    return _graph_to_model(nodes, inits, b"mini_conv", ["x"], ["y"])


def make_attention_onnx(
    wq: np.ndarray, wk: np.ndarray, wv: np.ndarray,
    ln_scale: np.ndarray, ln_bias: np.ndarray,
) -> bytes:
    """Single-head scaled-dot-product self-attention block with residual +
    LayerNormalization (the transformer encoder core):

        Q = x@wq; K = x@wk; V = x@wv
        A = softmax(Q @ K^T / sqrt(d))
        y = LayerNorm(x + A @ V; scale, bias)

    input 'x' (batch, seq, d); output 'y' same shape. Exercises
    MatMul/Transpose/Softmax/Add/LayerNormalization end-to-end."""
    d = wq.shape[0]
    scale = np.array(1.0 / np.sqrt(float(d)), dtype=np.float32)
    nodes = [
        _node("MatMul", ["x", "wq"], ["q"]),
        _node("MatMul", ["x", "wk"], ["k"]),
        _node("MatMul", ["x", "wv"], ["v"]),
        _node("Transpose", ["k"], ["kt"], {"perm": [0, 2, 1]}),
        _node("MatMul", ["q", "kt"], ["s0"]),
        _node("Mul", ["s0", "scl"], ["s1"]),
        _node("Softmax", ["s1"], ["a"], {"axis": -1}),
        _node("MatMul", ["a", "v"], ["ctx"]),
        _node("Add", ["x", "ctx"], ["res"]),
        _node("LayerNormalization", ["res", "ln_s", "ln_b"], ["y"],
              {"axis": -1}),
    ]
    inits = {"wq": wq, "wk": wk, "wv": wv, "scl": scale,
             "ln_s": ln_scale, "ln_b": ln_bias}
    return _graph_to_model(nodes, inits, b"mini_attention", ["x"], ["y"])


def make_seqpool_linear_onnx(w: np.ndarray) -> bytes:
    """Mean-pool-over-sequence + linear head: (1, seq, d) → ReduceMean
    over axis 1 → MatMul w(d,1) → (1, 1, 1). The SQL-expressible sequence
    scorer (score = avg(features) · w) used for the oracle-checked
    `score_sequence` driver query."""
    nodes = [
        _node("ReduceMean", ["x"], ["m"], {"axes": [1], "keepdims": 1}),
        _node("MatMul", ["m", "w"], ["y"]),
    ]
    return _graph_to_model(nodes, {"w": w}, b"mini_seqpool", ["x"], ["y"])


def make_multihead_attention_onnx(
    wq: np.ndarray, wk: np.ndarray, wv: np.ndarray, wo: np.ndarray,
    n_heads: int = 2,
) -> bytes:
    """Multi-head scaled-dot-product self-attention (h heads via Split
    along the feature axis, per-head attention, Concat, output
    projection): the composed Split/Transpose/MatMul/Softmax/Concat path
    a real exported transformer takes. Input 'x' (batch, seq, d); output
    'y' (batch, seq, d)."""
    d = wq.shape[0]
    dh = d // n_heads
    scale = np.array(1.0 / np.sqrt(float(dh)), dtype=np.float32)
    nodes = [
        _node("MatMul", ["x", "wq"], ["q"]),
        _node("MatMul", ["x", "wk"], ["k"]),
        _node("MatMul", ["x", "wv"], ["v"]),
        _node("Split", ["q"], [f"q{h}" for h in range(n_heads)],
              {"axis": -1, "num_outputs": n_heads}),
        _node("Split", ["k"], [f"k{h}" for h in range(n_heads)],
              {"axis": -1, "num_outputs": n_heads}),
        _node("Split", ["v"], [f"v{h}" for h in range(n_heads)],
              {"axis": -1, "num_outputs": n_heads}),
    ]
    for h in range(n_heads):
        nodes += [
            _node("Transpose", [f"k{h}"], [f"kt{h}"], {"perm": [0, 2, 1]}),
            _node("MatMul", [f"q{h}", f"kt{h}"], [f"s{h}"]),
            _node("Mul", [f"s{h}", "scl"], [f"sc{h}"]),
            _node("Softmax", [f"sc{h}"], [f"a{h}"], {"axis": -1}),
            _node("MatMul", [f"a{h}", f"v{h}"], [f"ctx{h}"]),
        ]
    nodes += [
        _node("Concat", [f"ctx{h}" for h in range(n_heads)], ["cat"],
              {"axis": -1}),
        _node("MatMul", ["cat", "wo"], ["y"]),
    ]
    inits = {"wq": wq, "wk": wk, "wv": wv, "wo": wo, "scl": scale}
    return _graph_to_model(nodes, inits, b"mini_mha", ["x"], ["y"])


def make_lstm_onnx(W: np.ndarray, R: np.ndarray, B: np.ndarray,
                   hidden: int) -> bytes:
    """Single-layer forward LSTM returning the last hidden state:
    LSTM → Squeeze(Y_h) (input 'x' (seq,batch,input), output 'y'
    (batch, hidden))."""
    nodes = [
        _node("LSTM", ["x", "W", "R", "B"], ["Y", "Y_h", "Y_c"],
              {"hidden_size": hidden}),
        _node("Squeeze", ["Y_h"], ["y"], {"axes": [0]}),
    ]
    return _graph_to_model(nodes, {"W": W, "R": R, "B": B}, b"mini_lstm",
                           ["x"], ["y"])
