"""Timing decorators (reference utils.py:13-42)."""

from __future__ import annotations

import time
from functools import wraps


def record_time(func):
    """Decorator printing wall-clock time of each call."""
    @wraps(func)
    def wrapper(*args, **kwargs):
        t0 = time.perf_counter()
        out = func(*args, **kwargs)
        print(f'{func.__name__}: {time.perf_counter() - t0:.6f}s')
        return out
    return wrapper


class Time:
    """Context manager printing elapsed wall-clock time."""

    def __init__(self, name: str = ''):
        self.name = name

    def __enter__(self):
        self.t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        self.elapsed = time.perf_counter() - self.t0
        print(f'{self.name}: {self.elapsed:.6f}s')
