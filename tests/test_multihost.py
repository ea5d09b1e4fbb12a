"""Multi-host runtime glue (parallel/multihost.py).

Single-process pieces are tested directly on the 8-device CPU mesh; the
cross-process path (jax.distributed + global array assembly + a psum'd
quant-stat reduction) runs as a real 2-process job over localhost.
"""

import socket
import subprocess
import sys
import textwrap

import numpy as np
import jax
import pytest

from brevitas_tpu.parallel import (global_batch_array, global_mesh,
                                   host_local_batch_slice)
from jax.sharding import PartitionSpec as P


def test_global_mesh_single_process():
    m = global_mesh([("data", -1), ("model", 2)])
    assert m.shape == {"data": 4, "model": 2}
    with pytest.raises(ValueError):
        global_mesh([("data", 3), ("model", 3)])


def test_host_local_slice_single_process():
    assert host_local_batch_slice(32) == slice(0, 32)


def test_global_batch_array_single_process():
    m = global_mesh([("data", 8)])
    x = np.arange(16 * 3, dtype=np.float32).reshape(16, 3)
    g = global_batch_array(x, m, P("data"))
    assert g.shape == (16, 3)
    np.testing.assert_array_equal(np.asarray(g), x)


WORKER = textwrap.dedent("""
    import sys
    import numpy as np
    import jax
    jax.config.update("jax_platforms", "cpu")

    port, pid = sys.argv[1], int(sys.argv[2])
    from brevitas_tpu.parallel import multihost as mh
    mh.initialize(coordinator_address=f"localhost:{port}",
                  num_processes=2, process_id=pid)
    assert jax.process_count() == 2
    mesh = mh.global_mesh([("data", 2)])   # one device per process

    # each process contributes its local half of the global batch
    full = np.arange(8, dtype=np.float32).reshape(4, 2)
    sl = mh.host_local_batch_slice(4)
    g = mh.global_batch_array(full[sl], mesh, jax.sharding.PartitionSpec("data"))
    assert g.shape == (4, 2)

    # a global quant-stat reduction across hosts: absmax over the whole batch
    from brevitas_tpu.core import stats as S
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P

    @jax.jit
    def absmax_global(x):
        return jnp.max(jnp.abs(x))

    out = float(absmax_global(g))
    assert out == 7.0, out
    print(f"proc {pid} OK global absmax {out}")
""")


def _free_port():
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


@pytest.mark.slow
def test_two_process_global_reduction(tmp_path):
    port = _free_port()
    script = tmp_path / "worker.py"
    script.write_text(WORKER)
    import os

    repo_root = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env = dict(os.environ,
               XLA_FLAGS="--xla_force_host_platform_device_count=1",
               JAX_PLATFORMS="cpu",
               PYTHONPATH=repo_root + os.pathsep
               + os.environ.get("PYTHONPATH", ""))
    procs = [subprocess.Popen([sys.executable, str(script), str(port),
                               str(pid)], env=env, stdout=subprocess.PIPE,
                              stderr=subprocess.STDOUT, text=True)
             for pid in (0, 1)]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=240)
        except subprocess.TimeoutExpired:
            p.kill()
            out, _ = p.communicate()
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-2000:]
    assert "proc 0 OK" in outs[0] and "proc 1 OK" in outs[1]
