"""QAT → integer-domain serving conversion.

The capability Brevitas delegates to ONNX backends (export + onnxruntime,
SURVEY §1 layer 6) done in-framework: freeze trained quantizer state, cache
int8 weights + scales, and run true int8 MXU matmuls/convs with dequant in
the epilogue (:mod:`brevitas_tpu.kernels.int_matmul`).

Asymmetric inputs use the standard QGEMM identity: with x_q = x/s_x + zp_x,
    y = s_x s_w ( x_q @ w_q - zp_x * colsum(w_q) )
so the zp correction folds into the bias. Input clip bounds come from the
FROZEN input quantizer (its bit width / signedness / narrow range), not a
hardcoded 8-bit range; trained output quantizers are re-applied as a frozen
affine requant on the serving output.
"""

from typing import Optional

import jax
import jax.numpy as jnp
from flax import nnx

from brevitas_tpu import config
from brevitas_tpu.graph.base import named_modules, set_module
from brevitas_tpu.kernels import int8_matmul
from brevitas_tpu.nn.conv import _QuantConvNd
from brevitas_tpu.nn.linear import QuantLinear
from brevitas_tpu.ops import max_int, min_int
from brevitas_tpu.quant.config import QuantType

Array = jnp.ndarray


def _prefer_pallas_gemm(m: int, k: int, n: int) -> bool:
    """Whether the Pallas epilogue-fused GEMM should beat XLA's int8
    dot_general for an (m, k) x (k, n) serving matmul.

    XLA's int8 path reaches ~94% of MXU peak and fuses the quantize
    prologue/dequant epilogue itself; the hand-written kernel pads every
    operand to its 256/1024 blocks, which measured 332k vs 579k img/s on
    batch-1024 LFC serving. Only large block-aligned problems avoid the
    padding tax."""
    return (m % 256 == 0 and k % 1024 == 0 and n % 1024 == 0
            and min(m, k, n) >= 2048)


def _freeze_act_quant(act_quantizer):
    """Extract (scale, zero_point, lo, hi) from a trained INT activation
    quantizer — post-training these no longer depend on the input."""
    if act_quantizer.quant_type != QuantType.INT:
        raise ValueError(
            f"integer serving supports INT input quantizers, got "
            f"{act_quantizer.quant_type}")
    from brevitas_tpu.quant.config import ScalingImplType
    if ScalingImplType(act_quantizer.cfg.scaling_impl) \
            == ScalingImplType.DYNAMIC:
        raise ValueError("dynamic act quant has no static scale to freeze — "
                         "use DynamicInt8InferenceLinear")
    act_quantizer.eval_mode()
    probe = jnp.zeros((1, 1), jnp.float32)
    qt = act_quantizer(probe)
    cfg = act_quantizer.cfg
    lo = float(min_int(cfg.signed, cfg.narrow_range, qt.bit_width))
    hi = float(max_int(cfg.signed, cfg.narrow_range, qt.bit_width))
    return qt.scale, qt.zero_point, lo, hi


def _freeze_output_quant(act_quantizer):
    """Frozen output requant params, or None when no output quant is set."""
    if act_quantizer is None or act_quantizer.quant_type == QuantType.NONE:
        return None
    s, zp, lo, hi = _freeze_act_quant(act_quantizer)
    return (jnp.asarray(s), jnp.asarray(zp), lo, hi)


def _apply_output_quant(y: Array, frozen) -> Array:
    if frozen is None:
        return y
    s, zp, lo, hi = frozen
    q = jnp.clip(jnp.round(y / s + zp), lo, hi)
    return (q - zp) * s



def _val(x):
    """Serving twins consume plain arrays; upstream quant layers may hand
    over a QuantTensor (return_quant_tensor chains) — take its value."""
    from brevitas_tpu.quant_tensor import QuantTensor

    return x.value if isinstance(x, QuantTensor) else x


def _carried_codes(x):
    """(codes_int8, scale, shift) from a CARRIED input grid, or None.

    QAT models built in the bnn_pynq style give their linears/convs no
    ``input_quant`` — the input grid arrives as QuantTensor metadata from
    the preceding activation quantizer (``return_quant_tensor`` chains,
    reference nn/quant_layer.py WBIOL law). The dequantized values are
    exact code multiples of the carried scale, so ``round(value/scale)``
    recovers the integer codes losslessly at serving time; unsigned grids
    (post-ReLU) re-center by 128 into int8 and the shift folds into the
    epilogue via the weight column sums. Symmetric (zero zero-point) grids
    only — the bnn_pynq/QuartzNet family contract."""
    from brevitas_tpu.quant_tensor import QuantTensor

    if not isinstance(x, QuantTensor) or x.scale is None:
        return None
    signed = bool(x.signed) if x.signed is not None else True
    shift = 0.0 if signed else 128.0
    codes = jnp.round(x.value / x.scale) - shift
    codes = jnp.clip(codes, -128.0, 127.0).astype(jnp.int8)
    return codes, jnp.asarray(x.scale, jnp.float32).reshape(()), shift


class Int8InferenceLinear(nnx.Module):
    """Serving twin of a trained QuantLinear: cached int8 kernel + fused
    quantized GEMM."""

    def __init__(self, qlinear: QuantLinear, act: Optional[str] = None):
        # (A2Q weights freeze against the input quantizer's static format —
        # quant_weight falls back to it when called without input info)
        qw = qlinear.quant_weight()
        assert float(jnp.max(qw.bit_width)) <= 8.0, "int8 path needs bw<=8"
        self.w_int = jax.lax.stop_gradient(qw.int())  # (in, out) int8
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        self.colsum = jnp.sum(self.w_int.astype(jnp.int32),
                              axis=0).astype(jnp.float32)
        bias = (qlinear.bias[...].astype(jnp.float32)
                if qlinear.bias is not None else jnp.zeros((self.w_int.shape[1],)))
        if qlinear.input_quant.quant_type == QuantType.NONE:
            # carried-grid mode: the input grid arrives as QuantTensor
            # metadata at call time (bnn_pynq-style chains)
            self.x_scale = None
            self.bias = bias
        else:
            x_scale, x_zp, self.x_lo, self.x_hi = _freeze_act_quant(
                qlinear.input_quant)
            self.x_scale = jnp.asarray(x_scale).reshape(())
            self.x_zp = float(jnp.asarray(x_zp).reshape(()))
            self.x_signed = qlinear.input_quant.cfg.signed
            # unsigned activations (uint8, e.g. post-ReLU) are re-centered
            # into int8 by subtracting 128; together with the zero-point this
            # folds into the bias via (x_q - zp) = (x_q - shift) + (shift - zp)
            self.x_shift = 0.0 if self.x_signed else 128.0
            self.bias = bias + (self.x_shift - self.x_zp) * self.colsum \
                * self.x_scale * self.w_scale
        self.act = act
        self.output_quant = _freeze_output_quant(
            getattr(qlinear, "output_quant", None))
        # ≤4-bit weights: store packed two-per-byte and unpack in VMEM inside
        # the GEMM (kernels/int4.py) — halves weight HBM footprint/traffic
        k, n = self.w_int.shape
        self.out_features = n
        from brevitas_tpu.kernels.int4 import int4_block_shapes_ok

        if (config.INT4_PACKED_SERVING and float(jnp.max(qw.bit_width)) <= 4.0
                and int4_block_shapes_ok(k, n)):
            from brevitas_tpu.kernels.int4 import pack_int4_rows

            self.w_packed = pack_int4_rows(self.w_int)
            self.w_int = None  # packed bytes are the only weight copy
        else:
            self.w_packed = None

    def __call__(self, x: Array) -> Array:
        from brevitas_tpu.kernels import int8_matmul_reference
        from brevitas_tpu.kernels.int4 import int4_matmul, int4_matmul_reference

        if self.x_scale is None:
            carried = _carried_codes(x)
            if carried is None:
                # no grid available for this input: dequantized-weight float
                # path keeps the function correct
                v = _val(x)
                w = self.w_int.astype(jnp.float32) * self.w_scale \
                    if self.w_int is not None else None
                if w is None:
                    from brevitas_tpu.kernels.int4 import unpack_int4
                    w = unpack_int4(
                        self.w_packed).astype(jnp.float32) * self.w_scale
                y = v @ w + self.bias
                y = jnp.maximum(y, 0.0) if self.act == "relu" else y
                return _apply_output_quant(y, self.output_quant)
            x_int, x_scale, shift = carried
            bias = self.bias + shift * self.colsum * x_scale * self.w_scale
            x = _val(x)
        else:
            x = _val(x)
            x_scale = self.x_scale
            bias = self.bias
            x_int = jnp.clip(jnp.round(x / x_scale + self.x_zp),
                             self.x_lo, self.x_hi)
            x_int = (x_int - self.x_shift).astype(jnp.int8)
        flat = x_int.reshape(-1, x_int.shape[-1])
        if self.w_packed is not None:
            on_tpu = jax.default_backend() == "tpu" and config.USE_PALLAS_KERNELS
            mm4 = int4_matmul if on_tpu else int4_matmul_reference
            y = mm4(flat, self.w_packed, x_scale, self.w_scale,
                    bias, act=self.act)
        else:
            use_pallas = (jax.default_backend() == "tpu"
                          and config.USE_PALLAS_KERNELS
                          and _prefer_pallas_gemm(flat.shape[0],
                                                  *self.w_int.shape))
            mm = int8_matmul if use_pallas else int8_matmul_reference
            y = mm(flat, self.w_int, x_scale, self.w_scale,
                   bias, act=self.act)
        y = y.reshape(*x.shape[:-1], self.out_features)
        return _apply_output_quant(y, self.output_quant)


class Int8InferenceConv(nnx.Module):
    """Serving twin of a trained QuantConv: int8 XLA conv with int32
    accumulation, dequant folded into the output epilogue."""

    def __init__(self, qconv: _QuantConvNd):
        if qconv.transposed:
            raise ValueError("Int8InferenceConv serves forward convolutions "
                             "only; QuantConvTranspose has no integer twin")
        qw = qconv.quant_weight()
        assert float(jnp.max(qw.bit_width)) <= 8.0
        self.w_int = jax.lax.stop_gradient(qw.int())  # HWIO int8
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        if qconv.input_quant.quant_type == QuantType.NONE:
            # carried-grid mode (see _carried_codes): the grid arrives as
            # QuantTensor metadata at call time
            self.x_scale = None
        else:
            x_scale, x_zp, self.x_lo, self.x_hi = _freeze_act_quant(
                qconv.input_quant)
            self.x_scale = jnp.asarray(x_scale).reshape(())
            self.x_zp = float(jnp.asarray(x_zp).reshape(()))
            self.x_signed = qconv.input_quant.cfg.signed
            # unsigned inputs re-center by 128 (see Int8InferenceLinear); the
            # x_zp/x_shift are static floats so the common symmetric-signed
            # case statically skips the border-correction conv below
            self.x_shift = 0.0 if self.x_signed else 128.0
        self.stride = qconv.stride
        self.padding = qconv.padding
        self.dilation = qconv.dilation
        self.groups = qconv.groups
        self.dn = qconv._dn()
        # border-correction kernel for recentered unsigned inputs: the
        # correction conv(1s, w) is batch-independent and linear in the
        # input channels, so it collapses to a batch-1, one-channel-per-
        # group conv with the input-channel-summed kernel — B*Cin/g times
        # cheaper than re-running the full conv (round-4 verdict #2: the
        # full-shape 1s-conv doubled every unsigned-act conv's cost and put
        # quartznet int8 serving behind bf16)
        self.w_ksum = jnp.sum(self.w_int.astype(jnp.int32), axis=-2,
                              keepdims=True).astype(jnp.float32)
        # pointwise (1x1, stride 1, ungrouped, zero-pad) convs serve as int8
        # MATMULS: XLA's s8 convolution path inserts layout copies around
        # every conv (measured: 27 copy ops vs 15 in the bf16 twin on a
        # 2-block QuartzNet), while the s8 dot hits the MXU at ~94% peak
        # with native layouts. Border correction for kernel-1 is exact as a
        # per-channel constant (no borders), so the ksum conv vanishes too.
        self._pointwise = (
            all(k == 1 for k in qconv.kernel_size)
            and all(s == 1 for s in qconv.stride)
            and all(d == 1 for d in qconv.dilation)
            and qconv.groups == 1
            # kernel-1 SAME == VALID == zero padding; only explicit nonzero
            # pads disqualify
            and (isinstance(qconv.padding, str)
                 or all(p == (0, 0) for p in qconv.padding)))
        if self._pointwise:
            cin = self.w_int.shape[-2]
            self.w_mat = self.w_int.reshape(cin, self.w_int.shape[-1])
            self.colsum = jnp.sum(self.w_mat.astype(jnp.int32),
                                  axis=0).astype(jnp.float32)
        self.bias = (qconv.bias[...].astype(jnp.float32)
                     if qconv.bias is not None else None)
        self.output_quant = _freeze_output_quant(
            getattr(qconv, "output_quant", None))

    def _conv(self, x_int: Array) -> Array:
        if self._pointwise:
            flat = x_int.reshape(-1, x_int.shape[-1])
            y = jax.lax.dot_general(
                flat, self.w_mat, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
            return y.reshape(x_int.shape[:-1] + (self.w_mat.shape[1],))
        return jax.lax.conv_general_dilated(
            x_int, self.w_int, window_strides=self.stride,
            padding=self.padding, rhs_dilation=self.dilation,
            dimension_numbers=self.dn, feature_group_count=self.groups,
            preferred_element_type=jnp.int32)

    def __call__(self, x: Array) -> Array:
        if self.x_scale is None:
            carried = _carried_codes(x)
            if carried is None:
                v = _val(x)
                w = self.w_int.astype(jnp.float32) * self.w_scale
                y = jax.lax.conv_general_dilated(
                    v, w, window_strides=self.stride, padding=self.padding,
                    rhs_dilation=self.dilation, dimension_numbers=self.dn,
                    feature_group_count=self.groups)
                if self.bias is not None:
                    y = y + self.bias
                return _apply_output_quant(y, self.output_quant)
            x_int, x_scale, shift = carried
            x = _val(x)
        else:
            x = _val(x)
            x_scale = self.x_scale
            shift = self.x_shift - self.x_zp  # static python float
            x_int = jnp.clip(jnp.round(x / x_scale + self.x_zp),
                             self.x_lo, self.x_hi)
            x_int = (x_int - self.x_shift).astype(jnp.int8)
        acc = self._conv(x_int).astype(jnp.float32)
        if shift != 0.0:
            if self._pointwise:
                # kernel-1: no borders — correction is a per-channel constant
                acc = acc + shift * self.colsum
            else:
                # per-position kernel weight sums handle zero-padding
                # borders; batch-1, channel-summed-kernel form (__init__)
                ones = jnp.ones((1,) + x.shape[1:-1] + (self.groups,),
                                jnp.float32)
                ksum = jax.lax.conv_general_dilated(
                    ones, self.w_ksum, window_strides=self.stride,
                    padding=self.padding, rhs_dilation=self.dilation,
                    dimension_numbers=self.dn,
                    feature_group_count=self.groups)
                acc = acc + shift * ksum
        y = acc * (x_scale * self.w_scale)
        if self.bias is not None:
            y = y + self.bias
        return _apply_output_quant(y, self.output_quant)


class Int8InferenceAttention(nnx.Module):
    """Serving twin of a trained QuantMultiheadAttention: int8 projection
    GEMMs plus the fused int8 attention core (int8 QK^T on the MXU, uint8
    probability grid, PV) — see kernels/int8_attention.py. Requires
    symmetric signed q/k/v quantizers and an unsigned probs quantizer (the
    layer defaults)."""

    def __init__(self, mha):
        self.num_heads = mha.num_heads
        self.head_dim = mha.head_dim
        self.embed_dim = mha.embed_dim
        self.use_rope = getattr(mha, "use_rope", False)
        self.rope_theta = getattr(mha, "rope_theta", 10000.0)
        # GQA: the int8 cache stores only the KV heads (H/KVH x smaller) and
        # codes expand to the full head count at attention time (exact —
        # repetition of int8 codes)
        self.num_kv_heads = getattr(mha, "num_kv_heads", mha.num_heads)
        self.q_proj = Int8InferenceLinear(mha.q_proj)
        self.k_proj = Int8InferenceLinear(mha.k_proj)
        self.v_proj = Int8InferenceLinear(mha.v_proj)
        self.out_proj = Int8InferenceLinear(mha.out_proj)
        for name in ("q", "k", "v"):
            qz = getattr(mha, f"{name}_quant")
            s, zp, lo, hi = _freeze_act_quant(qz)
            if float(jnp.asarray(zp).reshape(())) != 0.0 or not qz.cfg.signed:
                raise ValueError(
                    "int8 attention core needs symmetric signed q/k/v quant")
            setattr(self, f"{name}_scale", jnp.asarray(s).reshape(()))
            setattr(self, f"{name}_lo", lo)
            setattr(self, f"{name}_hi", hi)
        p_s, p_zp, p_lo, p_hi = _freeze_act_quant(mha.probs_quant)
        if p_lo != 0.0 or float(jnp.asarray(p_zp).reshape(())) != 0.0:
            raise ValueError("probs quantizer must be unsigned with zero "
                             "zero-point (softmax output is [0, 1])")
        self.p_scale = jnp.asarray(p_s).reshape(())
        self.p_levels = int(p_hi)
        # <=4-bit K/V codes fit a nibble: pack the decode cache two positions
        # per byte (2x less cache HBM than int8, exact — codes are lossless).
        # Default policy "auto" packs only at the kernel's measured win
        # boundary (head_dim >= INT4_KV_MIN_HEAD_DIM, PERF.md: at head_dim
        # 64 the nibble unpack costs ~12% vs int8 decode); "1" forces
        # packing (capacity over speed), "0" disables.
        from brevitas_tpu import config as _cfg
        fits_nibble = (self.k_lo >= -8.0 and self.k_hi <= 7.0
                       and self.v_lo >= -8.0 and self.v_hi <= 7.0)
        policy = str(_cfg.INT4_KV_CACHE).lower()
        if policy in ("0", "false", "off"):
            self.kv_int4 = False
        elif policy in ("1", "true", "on"):
            self.kv_int4 = fits_nibble
        else:  # auto: pack at the measured win boundary, or when the model
            # explicitly asked for a nibble KV grid (QuantLlama kv_bit_width)
            requested = getattr(mha, "kv_pack_requested", False)
            self.kv_int4 = fits_nibble and (
                requested or self.head_dim >= _cfg.INT4_KV_MIN_HEAD_DIM)

    def _to_int8(self, x: Array, name: str) -> Array:
        """Straight to the integer domain — no fake-quant round trip."""
        s = getattr(self, f"{name}_scale")
        return jnp.clip(jnp.round(x / s), getattr(self, f"{name}_lo"),
                        getattr(self, f"{name}_hi")).astype(jnp.int8)

    def _expand_kv_codes(self, y: Array, b: int) -> Array:
        """(B*KVH, T, D) int8 codes → (B*H, T, D): repeat each KV head for
        its query group (exact)."""
        groups = self.num_heads // self.num_kv_heads
        if groups == 1:
            return y
        t, d = y.shape[1], y.shape[2]
        return jnp.repeat(y.reshape(b, self.num_kv_heads, t, d), groups,
                          axis=1).reshape(b * self.num_heads, t, d)

    def __call__(self, x: Array, kv: Optional[Array] = None,
                 mask: Optional[Array] = None, causal: bool = False) -> Array:
        x = _val(x)
        from brevitas_tpu.kernels import int8_attention_dispatch

        if mask is not None:
            raise NotImplementedError(
                "arbitrary masks are not supported by the int8 serving core; "
                "serve the fake-quant model for masked attention")
        kv = x if kv is None else kv
        b, t, _ = x.shape
        h, d = self.num_heads, self.head_dim
        kvh = self.num_kv_heads

        def heads(y, n=h):
            # (B, T, n*D) → (B*n, T, D)
            return y.reshape(b, -1, n, d).transpose(0, 2, 1, 3) \
                .reshape(b * n, -1, d)

        q_f, k_f = self.q_proj(x), self.k_proj(kv)
        if self.use_rope:
            from brevitas_tpu.nn.attention import apply_rope

            # rotation is a float epilogue of the projection; the int8 codes
            # are codes of the ROTATED values (same as the fake-quant model)
            q_f = apply_rope(q_f.reshape(b, -1, h, d), jnp.arange(t),
                             self.rope_theta).reshape(b, -1, h * d)
            k_f = apply_rope(k_f.reshape(b, -1, kvh, d),
                             jnp.arange(kv.shape[1]),
                             self.rope_theta).reshape(b, -1, kvh * d)
        q = heads(self._to_int8(q_f, "q"))
        k = self._expand_kv_codes(heads(self._to_int8(k_f, "k"), kvh), b)
        v = self._expand_kv_codes(
            heads(self._to_int8(self.v_proj(kv), "v"), kvh), b)
        out = int8_attention_dispatch(
            q, k, v, self.q_scale, self.k_scale, self.v_scale, self.p_scale,
            head_dim=d, p_levels=self.p_levels, causal=causal)
        out = out.reshape(b, h, t, d).transpose(0, 2, 1, 3) \
            .reshape(b, t, self.embed_dim)
        return self.out_proj(out.astype(x.dtype))

    # -- incremental decoding with an int8 KV cache ---------------------------
    # The K/V quantizers are frozen per-tensor grids, so caching the int8
    # codes is EXACT — and costs 2x less HBM than bf16, 4x less than f32.

    def init_decode_cache(self, batch: int, max_len: int, dtype=None):
        # dtype is accepted for fake-quant-API compatibility and ignored:
        # the integer cache is int8 (or int4-packed) by construction
        bh = batch * self.num_kv_heads
        if self.kv_int4:
            # split-halves packed bytes: position r and r + l_half per byte;
            # l_half 128-aligned so the Pallas decode kernel tiles cleanly
            # (short caches skip the alignment — the decode dispatch falls
            # back to the XLA path there, and 8x over-allocating a 16-token
            # cache would defeat the memory win)
            l_half = -(-max_len // 2)
            if max_len >= 256:
                l_half += (-l_half) % 128
            shape = (bh, l_half, self.head_dim)
        else:
            shape = (bh, max_len, self.head_dim)
        return jnp.zeros(shape, jnp.int8), jnp.zeros(shape, jnp.int8)

    def decode_step(self, x_t: Array, k_cache: Array, v_cache: Array, pos):
        """One token (B, 1, E) against the int8 (or int4-packed) cache;
        writes K/V at ``pos`` (traced OK). Returns (y_t, k_cache, v_cache)."""
        from brevitas_tpu.kernels import (
            int4kv_decode_attention,
            int8_decode_attention,
            update_kv_packed,
        )

        b = x_t.shape[0]
        h, d = self.num_heads, self.head_dim
        kvh = self.num_kv_heads

        def heads(y, n=h):
            return y.reshape(b, 1, n, d).transpose(0, 2, 1, 3) \
                .reshape(b * n, 1, d)

        q_f, k_f = self.q_proj(x_t), self.k_proj(x_t)
        if self.use_rope:
            from brevitas_tpu.nn.attention import apply_rope

            pos_arr = jnp.asarray(pos).reshape(1)
            q_f = apply_rope(q_f.reshape(b, 1, h, d), pos_arr,
                             self.rope_theta).reshape(b, 1, h * d)
            k_f = apply_rope(k_f.reshape(b, 1, kvh, d), pos_arr,
                             self.rope_theta).reshape(b, 1, kvh * d)
        q = heads(self._to_int8(q_f, "q"))
        k_t = heads(self._to_int8(k_f, "k"), kvh)
        v_t = heads(self._to_int8(self.v_proj(x_t), "v"), kvh)
        if self.kv_int4:
            # cache stays packed at KVH heads (2x from packing, H/KVH x from
            # GQA); packed bytes expand to the full head count at read time
            # (a row repeat — exact)
            k_cache = update_kv_packed(k_cache, k_t, pos)
            v_cache = update_kv_packed(v_cache, v_t, pos)
            out = int4kv_decode_attention(
                q, self._expand_kv_codes(k_cache, b),
                self._expand_kv_codes(v_cache, b), pos, self.q_scale,
                self.k_scale, self.v_scale, self.p_scale, head_dim=d,
                p_levels=self.p_levels)
        else:
            # cache stays at KVH heads (H/KVH x less HBM under GQA); codes
            # expand to the full head count only at attention time
            k_cache = jax.lax.dynamic_update_slice(k_cache, k_t, (0, pos, 0))
            v_cache = jax.lax.dynamic_update_slice(v_cache, v_t, (0, pos, 0))
            out = int8_decode_attention(
                q, self._expand_kv_codes(k_cache, b),
                self._expand_kv_codes(v_cache, b), pos, self.q_scale,
                self.k_scale, self.v_scale, self.p_scale, head_dim=d,
                p_levels=self.p_levels)
        out = out.reshape(b, h, 1, d).transpose(0, 2, 1, 3) \
            .reshape(b, 1, self.embed_dim)
        return self.out_proj(out.astype(x_t.dtype)), k_cache, v_cache


class WeightOnlyInt4InferenceLinear(nnx.Module):
    """w4a16 serving twin: activations stay bf16/f32, weights live in HBM as
    packed int4 (4x less weight traffic than bf16) and unpack at the VMEM
    boundary inside the GEMM (kernels/int4.py). The LLM weight-only serving
    pattern; no reference analogue."""

    def __init__(self, qlinear: QuantLinear):
        if qlinear.input_quant.quant_type != QuantType.NONE:
            raise ValueError("weight-only serving wants NO input quantizer")
        qw = qlinear.quant_weight()
        if float(jnp.max(qw.bit_width)) > 4.0:
            raise ValueError("weight-only int4 path needs bit_width <= 4")
        from brevitas_tpu.kernels.int4 import pack_int4_rows

        w_int = jax.lax.stop_gradient(qw.int())
        k, n = w_int.shape
        if k % 2:
            raise ValueError("in_features must be even to pack int4")
        self.w_packed = pack_int4_rows(w_int)
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        self.bias = (qlinear.bias[...].astype(jnp.float32)
                     if qlinear.bias is not None else None)
        self.out_features = n
        self.in_features = k
        # the Pallas path keeps x resident in VMEM — gate to block-aligned
        # shapes, same policy as the int8 packed path
        from brevitas_tpu.kernels.int4 import int4_block_shapes_ok

        self._pallas_ok = int4_block_shapes_ok(k, n)
        self.output_quant = _freeze_output_quant(
            getattr(qlinear, "output_quant", None))

    def __call__(self, x: Array) -> Array:
        x = _val(x)
        from brevitas_tpu.kernels.int4 import (
            int4_weight_only_matmul,
            int4_weight_only_matmul_reference,
        )

        flat = x.reshape(-1, self.in_features)
        # measured on v5e (PERF.md): 1.5-1.6x over the bf16 dot at M>=32,
        # but 0.87x at M=8 where the padded VMEM block wastes MXU passes
        use_pallas = (jax.default_backend() == "tpu"
                      and config.USE_PALLAS_KERNELS and self._pallas_ok
                      and flat.shape[0] >= 16)
        mm = int4_weight_only_matmul if use_pallas \
            else int4_weight_only_matmul_reference
        y = mm(flat, self.w_packed, self.w_scale, self.bias)
        y = y.reshape(*x.shape[:-1], self.out_features).astype(x.dtype)
        return _apply_output_quant(y, self.output_quant)


class DynamicInt8InferenceLinear(nnx.Module):
    """Serving twin for dynamic (per-token or per-tensor) int8 activation
    quant: the input scale is computed from each request on the fly, the MAC
    runs int8×int8→int32 on the MXU, and the row-wise dequant rides the
    epilogue. The layer's own stateless ActQuantizer produces the grid, so
    serving is numerically identical to the fake-quant model. No reference
    analogue (the snapshot has no dynamic quant)."""

    def __init__(self, qlinear: QuantLinear):
        from brevitas_tpu.quant.config import ScalingImplType

        xq = qlinear.input_quant
        if (xq.quant_type != QuantType.INT
                or ScalingImplType(xq.cfg.scaling_impl)
                != ScalingImplType.DYNAMIC):
            raise ValueError("DynamicInt8InferenceLinear needs a DYNAMIC INT "
                             "input quantizer")
        if not xq.cfg.signed:
            raise ValueError("dynamic int8 serving is signed-symmetric only")
        qw = qlinear.quant_weight()
        assert float(jnp.max(qw.bit_width)) <= 8.0
        self.w_int = jax.lax.stop_gradient(qw.int())
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        self.input_quant = xq
        xq.eval_mode()
        self.bias = (qlinear.bias[...].astype(jnp.float32)
                     if qlinear.bias is not None else None)
        self.out_features = self.w_int.shape[1]
        oq = getattr(qlinear, "output_quant", None)
        if oq is not None and oq.quant_type != QuantType.NONE \
                and ScalingImplType(oq.cfg.scaling_impl) \
                == ScalingImplType.DYNAMIC:
            self.output_quant = None
            self.dynamic_output_quant = oq  # stateless, re-applied per call
        else:
            self.output_quant = _freeze_output_quant(oq)
            self.dynamic_output_quant = None

    def __call__(self, x: Array) -> Array:
        x = _val(x)
        qt = self.input_quant(x)  # stateless dynamic fake-quant
        x_int = jnp.round(qt.value / qt.scale).astype(jnp.int8)
        flat = x_int.reshape(-1, x_int.shape[-1])
        acc = jax.lax.dot_general(flat, self.w_int, (((1,), (0,)), ((), ())),
                                  preferred_element_type=jnp.int32)
        y = acc.astype(jnp.float32).reshape(*x.shape[:-1], self.out_features)
        y = y * qt.scale * self.w_scale  # (…,1) row scale × (O,) col scale
        if self.bias is not None:
            y = y + self.bias
        if self.dynamic_output_quant is not None:
            return self.dynamic_output_quant(y).value
        return _apply_output_quant(y, self.output_quant)


_FP8_DTYPES = {
    # (exponent_bits, mantissa_bits, bias, nan_reserved) → hardware dtype
    (4, 3, 7, True): jnp.float8_e4m3fn,
    (5, 2, 15, False): jnp.float8_e5m2,
}


def _fp8_dtype(cfg):
    key = (int(cfg.exponent_bit_width), int(cfg.mantissa_bit_width),
           int(cfg.exponent_bias) if cfg.exponent_bias is not None
           else 2 ** (int(cfg.exponent_bit_width) - 1) - 1,
           bool(cfg.nan_reserved))
    if key not in _FP8_DTYPES:
        raise ValueError(f"no hardware float8 dtype for format {key}")
    return _FP8_DTYPES[key]


class Fp8InferenceLinear(nnx.Module):
    """Serving twin of an FP8-quantized QuantLinear: weights stored as
    hardware float8 (half the HBM footprint/traffic of bf16), compute in
    bf16 on the MXU — every fp8 value is exactly representable in bf16 and
    bf16×bf16 products accumulate exactly in f32, so the twin matches the
    fake-quant model up to f32 summation order. No reference analogue
    (integer-only snapshot)."""

    def __init__(self, qlinear: QuantLinear):
        from brevitas_tpu.core.quant import minifloat_max_val

        wcfg = qlinear.weight_quant.cfg
        if qlinear.weight_quant.quant_type != QuantType.FLOAT:
            raise ValueError("Fp8InferenceLinear needs a FLOAT weight quant")
        self.w_dtype = _fp8_dtype(wcfg)
        qw = qlinear.quant_weight()
        self.w_scale = jnp.asarray(qw.scale).reshape(-1)
        self.w8 = jax.lax.stop_gradient(
            (qw.value / qw.scale).astype(self.w_dtype))
        xq = qlinear.input_quant
        if xq.quant_type != QuantType.FLOAT:
            raise ValueError("Fp8InferenceLinear needs a FLOAT input quant")
        from brevitas_tpu.quant.config import ScalingImplType
        if ScalingImplType(xq.cfg.scaling_impl) == ScalingImplType.DYNAMIC:
            # probing a dynamic quantizer with zeros would freeze a garbage
            # scale (scaling_min_val) and saturate every served activation
            raise ValueError("dynamic FLOAT input quant has no static scale "
                             "to freeze; layer stays on the fake-quant path")
        xcfg = xq.cfg
        self.x_dtype = _fp8_dtype(xcfg)
        xq.eval_mode()
        self.x_scale = jnp.asarray(
            xq(jnp.zeros((1, 1), jnp.float32)).scale).reshape(())
        self.x_max = minifloat_max_val(
            int(xcfg.exponent_bit_width), int(xcfg.mantissa_bit_width),
            int(xcfg.exponent_bias), nan_reserved=xcfg.nan_reserved)
        self.bias = (qlinear.bias[...].astype(jnp.float32)
                     if qlinear.bias is not None else None)
        self.out_features = self.w8.shape[1]
        self.output_quant = _freeze_output_quant(
            getattr(qlinear, "output_quant", None))

    def __call__(self, x: Array) -> Array:
        x = _val(x)
        # saturating cast: beyond-max values become NaN (e4m3fn) or inf
        # (e5m2) without the clip
        x8 = jnp.clip(x / self.x_scale, -self.x_max, self.x_max) \
            .astype(self.x_dtype)
        y = jax.lax.dot_general(
            x8.astype(jnp.bfloat16), self.w8.astype(jnp.bfloat16),
            (((x.ndim - 1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        y = y * (self.x_scale * self.w_scale)
        if self.bias is not None:
            y = y + self.bias
        return _apply_output_quant(y.astype(x.dtype), self.output_quant)


def convert_integer_inference(model: nnx.Module) -> nnx.Module:
    """Swap every eligible trained quant layer for its integer serving twin
    in place. Layers without an INT input quantizer (no input scale/grid
    available) are left on the fake-quant path."""
    from brevitas_tpu.nn import QuantMultiheadAttention

    converted_prefixes: list = []
    for path, mod in list(named_modules(model)):
        if any(path.startswith(p + ".") for p in converted_prefixes):
            continue  # parent already became a serving twin
        try:
            if isinstance(mod, QuantMultiheadAttention):
                set_module(model, path, Int8InferenceAttention(mod))
                converted_prefixes.append(path)
            elif isinstance(mod, QuantLinear) \
                    and mod.weight_quant.quant_type == QuantType.INT:
                from brevitas_tpu.quant.config import ScalingImplType
                if (mod.input_quant.quant_type == QuantType.INT
                        and ScalingImplType(mod.input_quant.cfg.scaling_impl)
                        == ScalingImplType.DYNAMIC):
                    set_module(model, path, DynamicInt8InferenceLinear(mod))
                elif (mod.input_quant.quant_type == QuantType.NONE
                      and float(jnp.max(
                          mod.quant_weight().bit_width)) <= 4.0):
                    # <=4-bit weights without an input grid: weight-only
                    # w4a16 serving (the LLM pattern)
                    set_module(model, path, WeightOnlyInt4InferenceLinear(mod))
                else:
                    # frozen input grid, or carried-QuantTensor grid when
                    # the layer has no input quantizer (bnn_pynq chains)
                    set_module(model, path, Int8InferenceLinear(mod))
            elif isinstance(mod, QuantLinear) \
                    and mod.weight_quant.quant_type == QuantType.FLOAT:
                set_module(model, path, Fp8InferenceLinear(mod))
            elif isinstance(mod, _QuantConvNd) and not mod.transposed \
                    and mod.weight_quant.quant_type == QuantType.INT:
                # transposed convs stay on the fake-quant path: the twin
                # runs a forward conv and would silently corrupt them
                set_module(model, path, Int8InferenceConv(mod))
        except (ValueError, NotImplementedError, AssertionError):
            continue
    return model
