"""Build hook: compile the native video IO library alongside the package.

All metadata lives in pyproject.toml; this shim only adds the
`make -C native/videoio` step (libavformat decode/encode/audio,
native/videoio/videoio.cpp) to build/develop. The build is best-effort:
hosts without the ffmpeg dev libraries still get a working package —
data/videoio.py retries the build on first use and raises with a clear
message only when video IO is actually exercised.
"""

import os
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        native_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "native", "videoio"
        )
        if os.path.isdir(native_dir):
            try:
                subprocess.run(["make", "-C", native_dir], check=True)
            except Exception as e:  # pragma: no cover
                print(f"warning: native videoio build skipped: {e}")
        super().run()


setup(cmdclass={"build_py": BuildWithNative})
