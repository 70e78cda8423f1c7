"""Pallas TPU kernels for the hot ops."""

from .correlation import correlation_pallas

__all__ = ["correlation_pallas"]
