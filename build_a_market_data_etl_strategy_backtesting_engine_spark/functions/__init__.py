"""Scalar column-expression libraries (math, derivatives pricing, EWM)."""
