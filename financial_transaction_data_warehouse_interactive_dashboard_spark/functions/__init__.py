"""Scalar/array function layer: portable hashing, text analytics."""
