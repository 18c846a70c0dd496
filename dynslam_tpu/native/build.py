"""Build the fastio CPython extension with g++ directly (no pybind11 in
this environment; setuptools would work too but a single compile command
is simpler and faster). Invoked automatically on first import (see
__init__.py) or manually:

    python -m dynslam_tpu.native.build
"""

from __future__ import annotations

import os
import subprocess
import sysconfig

HERE = os.path.dirname(os.path.abspath(__file__))
SRC = os.path.join(HERE, "fastio.cpp")


def ext_path() -> str:
    suffix = sysconfig.get_config_var("EXT_SUFFIX") or ".so"
    return os.path.join(HERE, "fastio" + suffix)


def build(verbose: bool = False) -> str:
    import numpy as np

    out = ext_path()
    py_include = sysconfig.get_paths()["include"]
    np_include = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{py_include}", f"-I{np_include}",
        SRC, "-o", out,
    ]
    if verbose:
        print("[build_native]", " ".join(cmd))
    subprocess.run(cmd, check=True, capture_output=not verbose)
    return out


def is_stale() -> bool:
    out = ext_path()
    return (not os.path.exists(out)
            or os.path.getmtime(out) < os.path.getmtime(SRC))


if __name__ == "__main__":
    print("built:", build(verbose=True))
