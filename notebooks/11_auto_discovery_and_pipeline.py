"""Tutorial 11 — automatic PTQ graph discovery, FINN export, 1F1B pipeline.

Three capabilities added in round 2, end to end:

1. ``preprocess_flexml(model, sample)`` — BN-fusion pairs and cross-layer
   equalization regions discovered from ONE traced forward (no hand lists).
2. ``export_finn_onnx`` — the FINN dataflow dialect (MultiThreshold
   activations + integer-weight MatMul/Conv + finn_datatype annotations).
3. ``pipeline_train_step`` — a real 1F1B pipeline-parallel training step.

Run: python notebooks/11_auto_discovery_and_pipeline.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

if os.environ.get("JAX_PLATFORMS"):
    jax.config.update("jax_platforms", os.environ["JAX_PLATFORMS"])
import jax.numpy as jnp
import numpy as np
from flax import nnx

import brevitas_tpu.graph as G

# ---------------------------------------------------------------------------
# 1. automatic discovery on a residual float model
# ---------------------------------------------------------------------------


class Block(nnx.Module):
    """conv→bn→relu→conv→bn + residual add."""

    def __init__(self, ch, rngs):
        self.conv1 = nnx.Conv(ch, ch, (3, 3), padding="SAME", rngs=rngs)
        self.bn1 = nnx.BatchNorm(ch, use_running_average=True, rngs=rngs)
        self.conv2 = nnx.Conv(ch, ch, (3, 3), padding="SAME", rngs=rngs)
        self.bn2 = nnx.BatchNorm(ch, use_running_average=True, rngs=rngs)

    def __call__(self, x):
        y = jax.nn.relu(self.bn1(self.conv1(x)))
        return jax.nn.relu(x + self.bn2(self.conv2(y)))


class Net(nnx.Module):
    def __init__(self, rngs):
        self.stem = nnx.Conv(3, 16, (3, 3), padding="SAME", rngs=rngs)
        self.bn = nnx.BatchNorm(16, use_running_average=True, rngs=rngs)
        self.block = Block(16, rngs)
        self.head = nnx.Linear(16, 10, rngs=rngs)

    def __call__(self, x):
        x = jax.nn.relu(self.bn(self.stem(x)))
        x = self.block(x)
        return self.head(x.mean(axis=(1, 2)))


model = Net(nnx.Rngs(0))
sample = np.zeros((1, 16, 16, 3), np.float32)

# the traced module graph is a first-class object
graph = G.trace_module_graph(model, sample)
print(f"traced {len(graph.modules)} modules")

pairs = G.find_bn_pairs(model, sample, graph=graph)
print("BN fusion pairs:", pairs)
assert ("stem", "bn") in pairs and ("block.conv1", "block.bn1") in pairs

rng = np.random.default_rng(0)
x = jnp.asarray(rng.standard_normal((2, 16, 16, 3)).astype(np.float32))
y_before = model(x)

# one call: fuse BNs, re-trace, extract regions, equalize — no lists
G.preprocess_flexml(model, sample)
np.testing.assert_allclose(model(x), y_before, rtol=1e-3, atol=1e-4)
print("auto preprocess is function-preserving OK")

# regions found AFTER fusion (reference transform order)
print("equalization regions:", G.extract_regions(model, sample))

# ---------------------------------------------------------------------------
# 2. FINN-dialect export of a binary MLP
# ---------------------------------------------------------------------------

from brevitas_tpu.export import export_finn_onnx, run_onnx, validate_onnx
from brevitas_tpu.export import onnx_proto as P
from brevitas_tpu.export.finn import read_finn_annotations
from brevitas_tpu.models import tfc
from brevitas_tpu.utils import eval_mode

bnn = tfc(1, 1, 1, dropout=0.0, rngs=nnx.Rngs(0))
xin = jnp.asarray(rng.random((4, 28, 28, 1)).astype(np.float32))
bnn(xin)
eval_mode(bnn)
blob = export_finn_onnx(bnn, jnp.zeros((1, 784)))
validate_onnx(blob)
g = P.parse_model(blob)
ops = [n.op_type for n in g.nodes]
print(f"FINN graph: {ops.count('MultiThreshold')} MultiThresholds, "
      f"{ops.count('MatMul')} integer MatMuls")
anns = read_finn_annotations(blob)
print("finn_datatype annotations:", sorted(set(anns.values())))
(y_onnx,) = run_onnx(blob, {"input": np.asarray(xin).reshape(4, -1)})
np.testing.assert_allclose(y_onnx, np.asarray(bnn(xin)), atol=1e-4)
print("FINN graph executes bit-matched to the model OK")

# ---------------------------------------------------------------------------
# 3. 1F1B pipeline-parallel training (virtual mesh if single-device)
# ---------------------------------------------------------------------------

if jax.device_count() >= 4:
    from jax.sharding import Mesh

    from brevitas_tpu.core import quant as Q
    from brevitas_tpu.core import stats as St
    from brevitas_tpu.parallel import pipeline_train_step, stack_stage_params

    def qstage(params, act):
        w = params["w"]
        thr = St.abs_max(w.reshape(1, -1)).reshape(())
        scale = Q.rescaling_scale(thr, jnp.asarray(4.0), signed=True,
                                  narrow_range=True)
        wq = Q.int_quant(w, scale, jnp.asarray(0.0), jnp.asarray(4.0),
                         signed=True, narrow_range=True)
        return jnp.tanh(act @ wq)

    S, D = 4, 16
    mesh = Mesh(np.array(jax.devices()[:S]), ("stage",))
    ks = jax.random.split(jax.random.PRNGKey(0), S)
    params = [dict(w=jax.random.normal(ks[i], (D, D)) * 0.5)
              for i in range(S)]
    stacked = stack_stage_params(params)
    xb = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))
    lb = jnp.asarray(rng.standard_normal((32, D)).astype(np.float32))

    loss, grads = jax.jit(lambda sp: pipeline_train_step(
        qstage, sp, xb, lb, lambda y, t: jnp.mean((y - t) ** 2),
        n_micro=8, mesh=mesh))(stacked)
    print(f"1F1B pipelined INT4-QAT step: loss {float(loss):.4f}, "
          f"grad norm {float(jnp.linalg.norm(grads['w'])):.4f} OK")
else:
    print("(<4 devices: skipping the pipeline leg; run with "
          "XLA_FLAGS=--xla_force_host_platform_device_count=8 "
          "JAX_PLATFORMS=cpu to see it)")

print("tutorial 11 complete")
