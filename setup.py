"""Build hook: compile the native runtime (csrc/*.cpp) into
rs_tfhe_tpu/native/libtfhe_client.so at wheel/install time.

The library is optional — rs_tfhe_tpu.native also compiles it on demand with
g++ at first use — but shipping it in the wheel means client-only deployments
need no toolchain. Static metadata lives in pyproject.toml.
"""

from __future__ import annotations

import shutil
import subprocess
from pathlib import Path

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        root = Path(__file__).resolve().parent
        srcs = [root / "csrc" / "tfhe_client.cpp",
                root / "csrc" / "circuit_scheduler.cpp"]
        out = root / "rs_tfhe_tpu" / "native" / "libtfhe_client.so"
        cxx = shutil.which("g++") or shutil.which("clang++")
        if cxx and all(s.exists() for s in srcs):
            try:
                subprocess.run(
                    [cxx, "-O3", "-std=c++17", "-fPIC", "-Wall", "-shared",
                     "-o", str(out), *[str(s) for s in srcs]],
                    check=True,
                )
            except subprocess.CalledProcessError:
                print("warning: native runtime build failed; "
                      "rs_tfhe_tpu.native will build on demand")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
