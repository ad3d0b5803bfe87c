"""VGG16 feature extractor for the perceptual loss.

The reference's ``PerceptualLoss`` builds torchvision VGG16 with
``weights=None`` — i.e. RANDOM weights (``AE_pretrained/reconstruction/
models/losses.py:100``; a documented reference quirk: the "perceptual" loss
measures distance in random-feature space — and is never used by the trained
objective anyway). This Flax port mirrors that: random Kaiming init by
default, with a torch-state-dict converter for users who supply real weights.

Feature taps: relu1_2, relu2_2, relu3_3, relu4_3 (the reference defaults).
"""

from __future__ import annotations

from typing import Any, Callable, Dict, List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

# VGG16 conv plan: (blocks of conv counts, channels)
_VGG16_PLAN: Tuple[Tuple[int, int], ...] = (
    (2, 64), (2, 128), (3, 256), (3, 512), (3, 512)
)
# tap name → (block index, conv index within block)
_TAPS = {
    "relu1_2": (0, 1),
    "relu2_2": (1, 1),
    "relu3_3": (2, 2),
    "relu4_3": (3, 2),
}


class VGG16Features(nn.Module):
    """Returns the tapped feature maps for NHWC input."""

    taps: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3", "relu4_3")
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jax.Array) -> Dict[str, jax.Array]:
        wanted = {_TAPS[t]: t for t in self.taps}
        last_block = max(b for b, _ in wanted)
        out: Dict[str, jax.Array] = {}
        x = x.astype(self.dtype)
        for b, (n_convs, ch) in enumerate(_VGG16_PLAN):
            if b > last_block:
                break
            for i in range(n_convs):
                x = nn.Conv(
                    ch, (3, 3), padding=((1, 1), (1, 1)),
                    kernel_init=nn.initializers.variance_scaling(2.0, "fan_out", "normal"),
                    dtype=self.dtype, param_dtype=jnp.float32,
                    name=f"conv{b + 1}_{i + 1}",
                )(x)
                x = nn.relu(x)
                if (b, i) in wanted:
                    out[wanted[(b, i)]] = x
            x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return out


def make_features_fn(
    rng: jax.Array,
    input_shape: Tuple[int, ...] = (1, 64, 64, 3),
    taps: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3", "relu4_3"),
    dtype: Any = jnp.float32,
    params=None,
) -> Callable[[jax.Array], Dict[str, jax.Array]]:
    """Frozen callable x → {tap: features} for ``ops.losses.perceptual_loss``.

    ONE trunk pass produces every tap (the module already returns the dict);
    per-tap closures would re-run the trunk once per tap per branch.
    """
    model = VGG16Features(taps=taps, dtype=dtype)
    if params is None:
        params = model.init(rng, jnp.zeros(input_shape))["params"]
    return jax.tree_util.Partial(model.apply, {"params": params})


def make_feature_fns(
    rng: jax.Array,
    input_shape: Tuple[int, ...] = (1, 64, 64, 3),
    taps: Sequence[str] = ("relu1_2", "relu2_2", "relu3_3", "relu4_3"),
    dtype: Any = jnp.float32,
    params=None,
) -> List[Callable[[jax.Array], jax.Array]]:
    """Per-tap callables (legacy shape of the API; each one re-runs the
    trunk — prefer ``make_features_fn``, which ``perceptual_loss`` also
    accepts directly)."""
    fn = make_features_fn(rng, input_shape, taps, dtype, params)

    def make(tap):
        return lambda x: fn(x)[tap]

    return [make(t) for t in taps]


def load_torch_vgg16_weights(path: str, abstract_params) -> Dict:
    """Convert a torchvision vgg16 ``state_dict`` (features.* indices)."""
    import torch

    sd = torch.load(str(path), map_location="cpu")
    if hasattr(sd, "state_dict"):
        sd = sd.state_dict()
    # torchvision feature indices of convs, in order
    conv_indices = [0, 2, 5, 7, 10, 12, 14, 17, 19, 21, 24, 26, 28]
    names = []
    for b, (n_convs, _) in enumerate(_VGG16_PLAN):
        for i in range(n_convs):
            names.append(f"conv{b + 1}_{i + 1}")
    p = jax.tree.map(np.asarray, abstract_params)
    for name, idx in zip(names, conv_indices):
        if name not in p:
            continue
        w = sd[f"features.{idx}.weight"].float().numpy()  # (out,in,kh,kw)
        b_ = sd[f"features.{idx}.bias"].float().numpy()
        p[name]["kernel"] = w.transpose(2, 3, 1, 0)
        p[name]["bias"] = b_
    return jax.tree.map(jnp.asarray, p)
