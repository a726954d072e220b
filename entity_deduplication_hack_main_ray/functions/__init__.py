"""Vectorized scalar/batch kernels shared by the Ray stages and the oracle."""
