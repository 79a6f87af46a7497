"""Bit twiddling for amplitude indexing (reference src/deepquantum/bitmath.py).

The GSPMD engine does not need explicit rank-bit manipulation, but these are
kept for API parity and for the explicit shard_map pair-exchange path.
"""

from __future__ import annotations

import jax.numpy as jnp

__all__ = ['power_of_2', 'is_power_of_2', 'log_base2', 'get_bit', 'flip_bit',
           'insert_bit', 'get_bit_mask']


def power_of_2(n):
    return 1 << n


def is_power_of_2(n) -> bool:
    n = int(n)
    return n > 0 and (n & (n - 1)) == 0


def log_base2(n) -> int:
    return int(n).bit_length() - 1


def get_bit(number, bit_index):
    """Bit at ``bit_index`` (0 = LSB) (reference bitmath.py:23)."""
    return (number >> bit_index) & 1


def flip_bit(number, bit_index):
    """Flip one bit (reference bitmath.py:28)."""
    return number ^ (1 << bit_index) if isinstance(number, int) \
        else jnp.bitwise_xor(number, 1 << bit_index)


def insert_bit(number, bit_index, bit_value=0):
    """Insert a bit, shifting higher bits up (reference bitmath.py:40)."""
    high = (number >> bit_index) << (bit_index + 1)
    low = number & ((1 << bit_index) - 1)
    return high | low | (bit_value << bit_index)


def get_bit_mask(number, nbit):
    """Bit mask of the lowest ``nbit`` bits (reference bitmath.py:53)."""
    return number & ((1 << nbit) - 1)
