"""Native (C++) runtime pieces. `fastio` is auto-built on first import
when a toolchain is available; importers fall back to numpy paths on any
failure (set DYNSLAM_NO_NATIVE_BUILD=1 to skip the build attempt).
"""

import os

if not os.environ.get("DYNSLAM_NO_NATIVE_BUILD"):
    try:
        from dynslam_tpu.native import build as _build

        if _build.is_stale():
            _build.build()
    except Exception:  # toolchain absent — numpy fallbacks handle it
        pass

try:
    from dynslam_tpu.native import fastio  # noqa: F401

    HAVE_NATIVE = True
except ImportError:
    HAVE_NATIVE = False
