"""Learned perception models (flax), TPU-native."""
