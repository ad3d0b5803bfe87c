"""unet_implementations_tpu — a TPU-native JAX/Flax/Pallas framework.

Built from scratch with the capabilities of the Ulixes-8/UNet-Implementations
reference suite (Oxford-IIIT Pet segmentation: background/cat/dog with
border-ignore label 255). One shared core replaces the reference's four
copy-pasted PyTorch sub-repos:

- ``models``   — parametric Flax UNet covering Our_UNet / CLIP_UNet /
                 autoencoder / transfer variants (NHWC, bf16-friendly).
- ``ops``      — fused Dice + weighted-CE loss, reconstruction losses
                 (MSE/SSIM/PSNR/perceptual), confusion-matrix metrics,
                 resize primitives matching cv2/torch semantics.
- ``kernels``  — Pallas TPU kernels for the hot fused ops.
- ``parallel`` — jax.sharding Mesh / pjit data-parallel training utilities.
- ``data``     — offline preprocessing pipeline + host loader + on-device
                 class-balanced augmentation.
- ``training`` — TrainState, optimizer/schedule factories, epoch loop,
                 Orbax checkpointing, early stopping, CSV logging.
- ``recipes``  — per-model entry wiring (our_unet, clip_unet, ae_recon,
                 ae_transfer) mirroring the reference CLIs.
"""

__version__ = "0.1.0"
