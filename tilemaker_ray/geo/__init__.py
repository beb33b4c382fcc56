"""Pure-numpy geospatial kernels (no Ray dependency).

Everything here is a vectorized function over numpy arrays so the Ray
Data stages can call them inside ``map_batches(batch_format="pyarrow")``
bodies without per-row Python loops.
"""
