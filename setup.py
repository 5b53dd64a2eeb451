"""Build hook: compile the native video IO library alongside the package.

All metadata lives in pyproject.toml; this shim only adds the
`make -C native/videoio` step (libavformat decode/encode/audio,
native/videoio/videoio.cpp) to build/develop, and ships the built
libvideoio.so inside the wheel as `t2v_turbo_tpu/_native/libvideoio.so`
(non-editable installs have no source tree to rebuild from —
data/videoio.py falls back to the packaged library). The build is
best-effort: hosts without the ffmpeg dev libraries still get a working
package — data/videoio.py retries the build on first use and raises with a
clear message only when video IO is actually exercised.
"""

import os
import shutil
import subprocess

from setuptools import setup
from setuptools.command.build_py import build_py


class BuildWithNative(build_py):
    def run(self):
        native_dir = os.path.join(
            os.path.dirname(os.path.abspath(__file__)), "native", "videoio"
        )
        built = None
        if os.path.isdir(native_dir):
            try:
                subprocess.run(["make", "-C", native_dir], check=True)
                built = os.path.join(native_dir, "libvideoio.so")
            except Exception as e:  # pragma: no cover
                print(f"warning: native videoio build skipped: {e}")
        super().run()
        if built and os.path.exists(built):
            dest_dir = os.path.join(self.build_lib, "t2v_turbo_tpu", "_native")
            os.makedirs(dest_dir, exist_ok=True)
            shutil.copy2(built, os.path.join(dest_dir, "libvideoio.so"))


setup(cmdclass={"build_py": BuildWithNative})
