"""exsr — a TPU-native explorable super-resolution framework.

A ground-up JAX/XLA/Pallas re-design with the capabilities of
YuvalBahat/Explorable-Super-Resolution (CVPR 2020): analytic consistency
enforcement (CEM), latent-controlled ESRGAN-style generation, gradient-based
latent-space editing, explorable JPEG decoding, and blind kernel estimation.
"""
__version__ = "0.1.0"
