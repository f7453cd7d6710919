"""TPU-native compute kernels: geometry, features, tracking, optimizers."""
