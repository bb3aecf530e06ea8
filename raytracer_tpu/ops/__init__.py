"""Batched compute primitives (the framework's "ops" layer).

Everything here is a pure function over ``jnp`` arrays, safe under ``jit``,
``vmap``, and ``shard_map``. Vectors are arrays with a trailing dimension of
3; batches broadcast over leading dimensions.
"""
