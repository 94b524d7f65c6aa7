"""Build the lassio C extension in-place:

    python native/build.py

Produces native/lassio*.so; lass_tpu.audio.io picks it up automatically.
"""
import os
import subprocess
import sys
import sysconfig

import numpy as np

HERE = os.path.dirname(os.path.abspath(__file__))


def build() -> str:
    src = os.path.join(HERE, "lassio.cpp")
    out = os.path.join(HERE, "lassio" +
                       (sysconfig.get_config_var("EXT_SUFFIX") or ".so"))
    include_py = sysconfig.get_paths()["include"]
    include_np = np.get_include()
    cmd = [
        "g++", "-O3", "-shared", "-fPIC", "-std=c++17",
        f"-I{include_py}", f"-I{include_np}",
        src, "-o", out,
    ]
    subprocess.run(cmd, check=True)
    return out


if __name__ == "__main__":
    path = build()
    print(f"built {path}")
    sys.path.insert(0, HERE)
    import lassio  # noqa: F401  (smoke import)

    print("import OK")
