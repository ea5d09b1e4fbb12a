"""MelGAN TTS quantitative parity (round-3 verdict #8).

No pretrained checkpoint is downloadable in-image (zero egress), so the
experiment is: build the REFERENCE 8-bit generator
(`text_to_speech/melgan/generator_brevitas.py:40`, weight-norm folded via
its own ``remove_weight_norm``), import the reference-initialized weights
into the brevitas_tpu twin, and report

- waveform max-diff / rel-L2 between frameworks on the same mel batch
- mel-spectral distance (L1 over log-mels of the two waveforms, the
  standard vocoder metric) via ``brevitas_tpu.audio.tacotron_mel``

then (``--train-steps N``) train BOTH from that same init on the same
synthetic mel→waveform regression task (L1 loss, Adam, same batch order)
and report the same metrics again between the trained generators.

Run: python -m parity.melgan_parity [--train-steps 30]
"""

import argparse
import json

import jax
import numpy as np

jax.config.update("jax_default_matmul_precision", "highest")


def build_reference_generator(seed: int = 0):
    from parity.refbridge import import_reference_brevitas

    import_reference_brevitas()
    import torch

    torch.manual_seed(seed)
    # the snapshot's ResStack.forward unpacks QuantTensor as the OLD 3-field
    # tuple (``x_unp, _, _ = x``, res_stack_brevitas.py:59) which the LIVE
    # reference core's 6-field NamedTuple breaks; shim the unpacking only,
    # keeping the train/eval residual semantics identical
    from brevitas.quant_tensor import QuantTensor
    from brevitas_examples.text_to_speech.melgan import (
        res_stack_brevitas as _rs,
    )

    def _forward(self, x):
        for layer in self.layers:
            x = self.scale_norm(x)
            x_unp = x.value if isinstance(x, QuantTensor) else x
            x_layer = self.scale_norm(layer(x_unp))
            x_layer_unp = (x_layer.value if isinstance(x_layer, QuantTensor)
                           else x_layer)
            if self.training:
                x = x_unp + x_layer_unp
            else:
                x = x + x_layer
        if isinstance(x, QuantTensor):
            x = x.value
        return x

    _rs.ResStack.forward = _forward
    from brevitas_examples.text_to_speech.melgan.generator_brevitas import (
        Generator,
    )

    g = Generator(mel_channel=80, bit_width=8, last_layer_bit_width=16)
    g.remove_weight_norm()  # fold weight_g/weight_v into plain .weight
    g.eval()
    return g


def build_tpu_generator():
    from flax import nnx

    from brevitas_tpu.models.melgan import melgan_8b

    return melgan_8b(rngs=nnx.Rngs(0))


def mel_l1(wav_a: np.ndarray, wav_b: np.ndarray) -> float:
    """L1 distance between log-mel spectrograms of two waveforms."""
    import jax.numpy as jnp

    from brevitas_tpu.audio import tacotron_mel

    ma = tacotron_mel(jnp.asarray(wav_a))
    mb = tacotron_mel(jnp.asarray(wav_b))
    return float(np.mean(np.abs(np.asarray(ma) - np.asarray(mb))))


def synth_mels(n, t, rng):
    """Synthetic log-mel batches shaped like Tacotron output (~[-11.5, 2])."""
    base = rng.standard_normal((n, t, 80)).astype(np.float32)
    return np.clip(base * 2.0 - 5.0, -11.5129, 2.0)


def forward_ref(g, mel_nhwc):
    import torch

    with torch.no_grad():
        out = g(torch.from_numpy(np.transpose(mel_nhwc, (0, 2, 1))))
        out = out.value if hasattr(out, "value") else out
    return out.numpy()[:, 0, :]  # (B, T*256)


def forward_tpu(m, mel_nhwc):
    import jax.numpy as jnp

    from brevitas_tpu.utils import eval_mode

    eval_mode(m)
    out = m(jnp.asarray(mel_nhwc))
    out = getattr(out, "value", out)
    return np.asarray(out)[:, :, 0]


def compare(tag, wav_ref, wav_tpu):
    n = min(wav_ref.shape[-1], wav_tpu.shape[-1])
    a, b = wav_ref[..., :n], wav_tpu[..., :n]
    rec = {
        "event": tag,
        "waveform_maxdiff": float(np.abs(a - b).max()),
        "waveform_rel_l2": float(np.linalg.norm(a - b) /
                                 (np.linalg.norm(a) + 1e-12)),
        "mel_l1": round(mel_l1(a, b), 6),
        # context scale: distance of the reference signal to silence — the
        # cross-framework mel_l1 is meaningful as a fraction of this
        "mel_l1_vs_silence": round(mel_l1(a, np.zeros_like(a)), 6),
        "ref_rms": float(np.sqrt((a ** 2).mean())),
    }
    print(json.dumps(rec), flush=True)
    return rec


def main(argv=None):
    p = argparse.ArgumentParser()
    p.add_argument("--train-steps", type=int, default=0)
    p.add_argument("--batch", type=int, default=2)
    p.add_argument("--frames", type=int, default=32)
    p.add_argument("--lr", type=float, default=1e-4)
    args = p.parse_args(argv)

    import torch

    import jax.numpy as jnp
    import optax
    from flax import nnx

    from brevitas_tpu.interop.torch_import import import_torch_state_dict
    from brevitas_tpu.utils import train_mode

    rng = np.random.default_rng(0)
    ref = build_reference_generator()
    tpu = build_tpu_generator()
    sd = {k: v.detach().cpu().numpy() for k, v in ref.state_dict().items()}
    import_torch_state_dict(tpu, sd)

    mel = synth_mels(args.batch, args.frames, rng)
    wav_ref = forward_ref(ref, mel)
    wav_tpu = forward_tpu(tpu, mel)
    compare("import_parity", wav_ref, wav_tpu)

    if args.train_steps:
        # same task, same batches: L1 regression to a synthetic waveform
        # target correlated with the mel energy (vocoder-shaped objective)
        targets = {}

        def target_for(mel_b):
            key = mel_b.tobytes()[:64]
            if key not in targets:
                e = mel_b.mean(-1, keepdims=True)  # (B, T, 1)
                t = np.repeat(e, 256, axis=1)
                targets[key] = np.tanh(t).astype(np.float32)
            return targets[key]

        ref.train()
        opt_r = torch.optim.Adam(ref.parameters(), lr=args.lr)
        train_mode(tpu)
        opt_t = nnx.Optimizer(tpu, optax.adam(args.lr), wrt=nnx.Param)

        @nnx.jit
        def tpu_step(model, opt, m_b, t_b):
            def loss_fn(mm):
                out = mm(m_b)
                out = getattr(out, "value", out)
                return jnp.mean(jnp.abs(out[:, :, 0] - t_b))

            loss, grads = nnx.value_and_grad(loss_fn)(model)
            opt.update(model, grads)
            return loss

        for step in range(args.train_steps):
            mel_b = synth_mels(args.batch, args.frames,
                               np.random.default_rng(100 + step))
            t_b = target_for(mel_b)[:, :, 0]
            out = ref(torch.from_numpy(np.transpose(mel_b, (0, 2, 1))))
            out = out.value if hasattr(out, "value") else out
            loss_r = (out[:, 0, :] - torch.from_numpy(t_b)).abs().mean()
            opt_r.zero_grad()
            loss_r.backward()
            opt_r.step()
            loss_t = tpu_step(tpu, opt_t, jnp.asarray(mel_b),
                              jnp.asarray(t_b))
            if step % 10 == 0 or step == args.train_steps - 1:
                print(json.dumps({
                    "event": "train_step", "step": step,
                    "loss_ref": round(float(loss_r.item()), 6),
                    "loss_tpu": round(float(loss_t), 6)}), flush=True)

        ref.eval()
        wav_ref = forward_ref(ref, mel)
        wav_tpu = forward_tpu(tpu, mel)
        compare("trained_parity", wav_ref, wav_tpu)


if __name__ == "__main__":
    main()
