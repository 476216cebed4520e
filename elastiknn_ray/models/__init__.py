"""Vectorized reimplementations of the reference's hashing/similarity kernels
(elastiknn-models/src/main/java/com/klibisz/elastiknn/models/*.java) as
NumPy batch functions suitable for ``Dataset.map_batches``."""
