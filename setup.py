"""Build the native C artifacts as part of pip install / wheel builds.

Three artifacts (src/native/), all optional at runtime — every loader
falls back to pure numpy/Python when they are missing:

  * findkmer_shmalloc        — CPython extension (PyInit_findkmer_shmalloc):
                               shared-memory numpy allocator.
  * libfindkmer_encode.so    — plain C shared library, loaded via ctypes
                               (findkmer_tpu/io/native.py): host encode /
                               pack / format / merge hot loops.
  * shmmap_preload.so        — LD_PRELOAD shim (not a Python module).

The ctypes libraries are built through a small build_ext subclass that
skips the PyInit export check and emits unversioned .so names into
findkmer_tpu/_native/, where the loaders look first (the in-repo
Makefile + autobuild path remains the dev fallback).
"""

import os

from setuptools import Extension, setup
from setuptools.command.build_ext import build_ext


class CTypesExtension(Extension):
    """A plain shared library (dlopen'd via ctypes, no PyInit)."""


class build_ext_ctypes(build_ext):
    def build_extensions(self):
        # numpy include resolved at build time, not setup.py import time
        # (isolated PEP-517 envs install numpy per [build-system]
        # requires AFTER setup.py is first parsed)
        import numpy

        for ext in self.extensions:
            if ext.name == "findkmer_shmalloc":
                ext.include_dirs.append(numpy.get_include())
        super().build_extensions()

    def get_export_symbols(self, ext):
        if isinstance(ext, CTypesExtension):
            return []
        return super().get_export_symbols(ext)

    def get_ext_filename(self, ext_name):
        # called with the full dotted name in some setuptools versions
        # and with only the last segment in others — match both
        leaf = ext_name.split(".")[-1]
        for ext in self.extensions:
            if isinstance(ext, CTypesExtension) and (
                ext.name == ext_name or ext.name.split(".")[-1] == leaf
            ):
                return os.path.join(*ext_name.split(".")) + ".so"
        return super().get_ext_filename(ext_name)


ext_modules = [
    Extension(
        "findkmer_shmalloc",
        sources=["src/native/shmalloc.c"],
        extra_compile_args=["-O2", "-std=c11"],
    ),
    CTypesExtension(
        "findkmer_tpu._native.libfindkmer_encode",
        sources=["src/native/encode.c"],
        # portable by default; FINDKMER_MARCH_NATIVE=1 matches the
        # in-repo Makefile's -march=native for this-machine builds
        extra_compile_args=["-O3", "-std=c17", "-fopenmp"]
        + (["-march=native"]
           if os.environ.get("FINDKMER_MARCH_NATIVE") == "1" else []),
        extra_link_args=["-fopenmp"],
    ),
    CTypesExtension(
        "findkmer_tpu._native.shmmap_preload",
        sources=["src/native/shmmap_preload.c"],
        extra_compile_args=["-O2", "-std=c11"],
        extra_link_args=["-ldl"],
    ),
]

setup(
    ext_modules=ext_modules,
    cmdclass={"build_ext": build_ext_ctypes},
)
