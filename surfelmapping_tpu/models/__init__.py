"""Neural models: the SPADE GAN enhancement stage in flax (TPU-native
counterpart of the reference's SPADE/ PyTorch tree)."""
