"""TPU-native compute ops: embedding lookups, metrics, fused kernels."""
