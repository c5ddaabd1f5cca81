"""C++ sources for the native runtime pieces (built on first use by
data/native_loader.py with the host g++; numpy fallback otherwise).

This package marker exists so setuptools' package discovery includes the
directory and the [tool.setuptools.package-data] stanza actually ships
npy_loader.cpp in built distributions.
"""
