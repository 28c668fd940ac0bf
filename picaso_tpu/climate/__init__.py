"""Radiative-convective equilibrium climate solver (TPU-native)."""
