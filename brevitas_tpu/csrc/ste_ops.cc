// Native STE op kernels as XLA FFI custom calls.
//
// Capability parity with the reference's single native component
// (src/brevitas/csrc/autograd_ste_ops.cpp: 11 torch::autograd::Function
// subclasses registered via TORCH_LIBRARY). The reference needs C++ because
// torch.autograd.Function could not be TorchScript-compiled; under JAX the
// backward is a custom_vjp at the Python level, so the native side only
// carries the forward rounding/clamping primitives. These custom calls bind
// to the CPU backend (XLA:TPU executes the Pallas/XLA-fused path; arbitrary
// host C++ cannot run on the TPU itself) and are selected with
// BREVITAS_TPU_NATIVE_STE=1 — mirroring BREVITAS_NATIVE_STE_BACKEND.
//
// Build: see brevitas_tpu/csrc/build.py (g++ -shared against the
// jaxlib-bundled XLA FFI headers; no other dependencies).

#include <algorithm>
#include <cmath>
#include <cstdint>

#include "xla/ffi/api/ffi.h"

namespace ffi = xla::ffi;

namespace {

using F32Buf = ffi::Buffer<ffi::F32>;
using F32Res = ffi::ResultBuffer<ffi::F32>;

template <typename Fn>
ffi::Error Elementwise(const F32Buf& x, F32Res y, Fn&& fn) {
  const float* in = x.typed_data();
  float* out = y->typed_data();
  const int64_t n = x.element_count();
  for (int64_t i = 0; i < n; ++i) out[i] = fn(in[i]);
  return ffi::Error::Success();
}

// round-half-to-even, matching jnp.round / torch.round
inline float RoundHalfEven(float v) { return std::nearbyintf(v); }

ffi::Error RoundSte(F32Buf x, F32Res y) {
  return Elementwise(x, y, RoundHalfEven);
}

ffi::Error FloorSte(F32Buf x, F32Res y) {
  return Elementwise(x, y, [](float v) { return std::floor(v); });
}

ffi::Error CeilSte(F32Buf x, F32Res y) {
  return Elementwise(x, y, [](float v) { return std::ceil(v); });
}

ffi::Error RoundToZeroSte(F32Buf x, F32Res y) {
  return Elementwise(x, y, [](float v) { return std::trunc(v); });
}

ffi::Error DpuRoundSte(F32Buf x, F32Res y) {
  return Elementwise(x, y, [](float v) {
    float fl = std::floor(v);
    if (v < 0.0f && (v - fl) == 0.5f) return std::ceil(v);
    return RoundHalfEven(v);
  });
}

ffi::Error BinarySignSte(F32Buf x, F32Res y) {
  return Elementwise(x, y, [](float v) { return v >= 0.0f ? 1.0f : -1.0f; });
}

ffi::Error TernarySignSte(F32Buf x, F32Res y) {
  return Elementwise(x, y,
                     [](float v) { return (v > 0.f) - (v < 0.f) + 0.0f; });
}

ffi::Error AbsBinarySignGrad(F32Buf x, F32Res y) {
  return Elementwise(x, y, [](float v) { return std::fabs(v); });
}

// tensor_clamp with broadcastable scalar-or-full bounds
ffi::Error TensorClampSte(F32Buf x, F32Buf lo, F32Buf hi, F32Res y) {
  const float* in = x.typed_data();
  const float* lo_p = lo.typed_data();
  const float* hi_p = hi.typed_data();
  float* out = y->typed_data();
  const int64_t n = x.element_count();
  const bool lo_scalar = lo.element_count() == 1;
  const bool hi_scalar = hi.element_count() == 1;
  for (int64_t i = 0; i < n; ++i) {
    float v = in[i];
    float l = lo_scalar ? lo_p[0] : lo_p[i];
    float h = hi_scalar ? hi_p[0] : hi_p[i];
    out[i] = std::min(std::max(v, l), h);
  }
  return ffi::Error::Success();
}

ffi::Error ScalarClampMinSte(F32Buf x, F32Res y, float min_val) {
  return Elementwise(x, y,
                     [min_val](float v) { return std::max(v, min_val); });
}

// fused fake-quant forward: round(x/scale + zp) clamped, dequantized — the
// whole IntQuant.forward (reference int_base.py:87-97) as one native pass.
ffi::Error FakeQuant(F32Buf x, F32Buf scale, F32Buf zp, F32Res y, float lo,
                     float hi) {
  const float* in = x.typed_data();
  const float s = scale.typed_data()[0];
  const float z = zp.typed_data()[0];
  float* out = y->typed_data();
  const float inv = 1.0f / s;
  const int64_t n = x.element_count();
  for (int64_t i = 0; i < n; ++i) {
    float q = RoundHalfEven(in[i] * inv + z);
    q = std::min(std::max(q, lo), hi);
    out[i] = (q - z) * s;
  }
  return ffi::Error::Success();
}

}  // namespace

#define BTPU_DEFINE_UNARY(sym, fn)                                 \
  XLA_FFI_DEFINE_HANDLER_SYMBOL(                                   \
      sym, fn,                                                     \
      ffi::Ffi::Bind().Arg<F32Buf>().Ret<F32Buf>())

BTPU_DEFINE_UNARY(kRoundSte, RoundSte);
BTPU_DEFINE_UNARY(kFloorSte, FloorSte);
BTPU_DEFINE_UNARY(kCeilSte, CeilSte);
BTPU_DEFINE_UNARY(kRoundToZeroSte, RoundToZeroSte);
BTPU_DEFINE_UNARY(kDpuRoundSte, DpuRoundSte);
BTPU_DEFINE_UNARY(kBinarySignSte, BinarySignSte);
BTPU_DEFINE_UNARY(kTernarySignSte, TernarySignSte);
BTPU_DEFINE_UNARY(kAbsBinarySignGrad, AbsBinarySignGrad);

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    kTensorClampSte, TensorClampSte,
    ffi::Ffi::Bind().Arg<F32Buf>().Arg<F32Buf>().Arg<F32Buf>().Ret<F32Buf>());

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    kScalarClampMinSte, ScalarClampMinSte,
    ffi::Ffi::Bind().Arg<F32Buf>().Ret<F32Buf>().Attr<float>("min_val"));

XLA_FFI_DEFINE_HANDLER_SYMBOL(
    kFakeQuant, FakeQuant,
    ffi::Ffi::Bind().Arg<F32Buf>().Arg<F32Buf>().Arg<F32Buf>().Ret<F32Buf>()
        .Attr<float>("lo").Attr<float>("hi"));

// Export plain-C symbol table for ctypes-based registration (no pybind11 in
// this image; the Python side looks these up with ctypes and hands the
// capsules to jax.ffi.register_ffi_target).
extern "C" {
#define BTPU_EXPORT(name, sym) \
  void* brevitas_tpu_##name() { return reinterpret_cast<void*>(sym); }

BTPU_EXPORT(round_ste, kRoundSte)
BTPU_EXPORT(floor_ste, kFloorSte)
BTPU_EXPORT(ceil_ste, kCeilSte)
BTPU_EXPORT(round_to_zero_ste, kRoundToZeroSte)
BTPU_EXPORT(dpu_round_ste, kDpuRoundSte)
BTPU_EXPORT(binary_sign_ste, kBinarySignSte)
BTPU_EXPORT(ternary_sign_ste, kTernarySignSte)
BTPU_EXPORT(abs_binary_sign_grad, kAbsBinarySignGrad)
BTPU_EXPORT(tensor_clamp_ste, kTensorClampSte)
BTPU_EXPORT(scalar_clamp_min_ste, kScalarClampMinSte)
BTPU_EXPORT(fake_quant, kFakeQuant)
#undef BTPU_EXPORT
}
