"""Batched binary-descriptor Hamming distances on the MXU.

TPU-native replacement for the reference's popcount kernels
(src/cuda/orb_stereo_match.cu ORBGetDistanceStereoGPU,
src/cuda/orb_matcher.cu ORB_compute_descriptor_Distance_GPU and the SSE
popcount in src/ORBmatcher.cpp:2143-2160).

Key identity: for descriptors unpacked to {0,1} bit vectors a, b of length
256,  hamming(a, b) = popcount(a) + popcount(b) - 2 * a.b  — so an all-pairs
distance matrix is one (M,256)x(256,N) matmul, which is exactly what the MXU
wants.  We unpack uint8 descriptors once per frame.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def unpack_bits(desc_u8: jnp.ndarray) -> jnp.ndarray:
    """(K, 32) uint8 -> (K, 256) float32 in {0,1}, LSB-first per byte."""
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (desc_u8[..., None] >> shifts) & 1  # (K, 32, 8)
    return bits.reshape(desc_u8.shape[0], 256).astype(jnp.float32)


def hamming_matrix(desc_a: jnp.ndarray, desc_b: jnp.ndarray,
                   dtype=jnp.int32) -> jnp.ndarray:
    """All-pairs Hamming distances.

    desc_a: (M, 32) uint8, desc_b: (N, 32) uint8 -> (M, N) `dtype`.
    Exact: the matmul operates on {0,1} floats, every partial sum is an
    integer < 2^24, so float32 accumulation is lossless.  Distances are
    <= 256, exactly representable in bfloat16 too — pass dtype=bfloat16 to
    halve the HBM footprint of big (M, N) matrices (the stereo coarse
    match's (K, K) table dominates the front-end's temp memory otherwise).
    """
    a = unpack_bits(desc_a)
    b = unpack_bits(desc_b)
    dots = jnp.dot(a, b.T, preferred_element_type=jnp.float32)
    pa = jnp.sum(a, axis=1, keepdims=True)
    pb = jnp.sum(b, axis=1, keepdims=True)
    return (pa + pb.T - 2.0 * dots).astype(dtype)


def hamming_pairs(desc_a: jnp.ndarray, desc_b: jnp.ndarray) -> jnp.ndarray:
    """Row-wise Hamming distance of aligned pairs: (K,32),(K,32) -> (K,) int32."""
    x = jnp.bitwise_xor(desc_a, desc_b)
    shifts = jnp.arange(8, dtype=jnp.uint8)
    bits = (x[..., None] >> shifts) & 1
    return jnp.sum(bits.astype(jnp.int32), axis=(1, 2))
