"""Scalar/vector function library: distance kernels, quantization,
text analysis, hashing. Column-expression variants (JVM-side) and
NumPy variants (Arrow batch) of each hot kernel."""
