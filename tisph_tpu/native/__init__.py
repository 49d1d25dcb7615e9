"""Native (C++) host-side tier: grid-hashed clustering + BPA boundary walk.

Built on demand with make/g++ and loaded via ctypes (see loader.py).  All
callers degrade gracefully to the numpy implementations when no compiler is
available.
"""
