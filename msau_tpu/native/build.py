"""Build the native rasterlib shared object.

Usage: python msau_tpu/native/build.py
Produces msau_tpu/native/librasterlib.so (gcc -O2).  The Python layer
falls back to a pure-numpy implementation when the .so is absent.
"""

import os
import subprocess
import sys

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "rasterlib.c")
OUT = os.path.join(HERE, "librasterlib.so")


def build(verbose: bool = True) -> str:
    cmd = ["gcc", "-O2", "-shared", "-fPIC", "-o", OUT, SRC]
    if verbose:
        print(" ".join(cmd))
    subprocess.run(cmd, check=True)
    return OUT


if __name__ == "__main__":
    build()
    print(f"built {OUT}")
