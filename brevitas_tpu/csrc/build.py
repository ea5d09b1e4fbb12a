"""Build the native STE library (analogue of the reference's JIT cpp_extension
load at import, src/brevitas/__init__.py:60-84)."""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "ste_ops.cc")
OUT = os.path.join(HERE, "libbrevitas_tpu_ste.so")


def include_dir() -> str:
    import jax.ffi

    return jax.ffi.include_dir()


def build(force: bool = False) -> str:
    if os.path.exists(OUT) and not force and \
            os.path.getmtime(OUT) >= os.path.getmtime(SRC):
        return OUT
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_dir()}", SRC, "-o", OUT,
    ]
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    print(build(force="--force" in sys.argv))
