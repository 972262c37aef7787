"""Packaged native artifacts (built by setup.py build_ext).

In a wheel/installed tree this directory holds libfindkmer_encode.so
and shmmap_preload.so; in a source checkout it is empty and the loaders
fall back to src/native/ (Makefile or cc autobuild).
"""
