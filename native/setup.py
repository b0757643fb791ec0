"""Build the _zf_native C++ extension:

    python native/setup.py build_ext --inplace

Drops _zf_native*.so at the repo root (importable next to zigflac_tpu/).
"""

import os

from setuptools import Extension, setup

here = os.path.dirname(os.path.abspath(__file__))

setup(
    name="zf_native",
    version="0.1.0",
    ext_modules=[
        Extension(
            "_zf_native",
            sources=[os.path.join(here, "zf_native.cpp")],
            extra_compile_args=["-O3", "-std=c++17", "-march=native",
                                "-pthread"],
            extra_link_args=["-pthread"],
            language="c++",
        )
    ],
    script_args=["build_ext", "--inplace"]
    if os.environ.get("ZF_NATIVE_AUTOBUILD")
    else None,
)
