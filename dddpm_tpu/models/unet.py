"""The UNet epsilon-predictor (flax.linen, NHWC).

Structural parity with /root/reference/models/unet/unet.py:10-104
(lucidrains-style 4-level UNet with linear attention at every
resolution), including the reference's quirks:

- the expansive path has len(dim_mults)-1 levels, so the first (highest
  resolution) skip connection is computed but never consumed;
- all ups levels end in an Upsample (is_last is never true there);
- only the contracting path's ResnetBlocks receive dropout.

TPU-first design: channels-last, one static Python loop per level
(unrolled at trace time — static shapes for XLA), bf16 compute with f32
params/GroupNorm statistics, time embedding in f32.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from dddpm_tpu.models.blocks import (
    Block,
    Downsample,
    PreNormLinearAttention,
    ResnetBlock,
    TimeMLP,
    Upsample,
    conv1x1,
)


def resolve_use_pallas(config: dict) -> bool:
    """Resolve use_pallas_attention='auto' to a concrete bool.

    'auto' means: fused Pallas kernel on real hardware; einsum path on
    CPU (where Pallas would fall back to the slow interpreter).  Callers
    (build_model) write the resolved value back into the run config so
    the numerics path travels inside the checkpoint instead of flipping
    silently when a TPU-built config is later evaluated on CPU.
    """
    use_pallas = config.get("use_pallas_attention", "auto")
    if use_pallas == "auto":
        import jax

        use_pallas = jax.default_backend() != "cpu"
    return bool(use_pallas)


class Unet(nn.Module):
    """UNet(dim, dim_mults) predicting eps(x_t, t), same shape as x_t."""

    dim: int = 128
    in_channels: int = 3
    dim_mults: Sequence[int] = (1, 2, 2, 2)
    dropout: float = 0.0
    dtype: jnp.dtype = jnp.float32
    use_pallas: bool = False
    remat: bool = False
    # opt-in W8A8 serving mode (ops/quant.py): None | "int8".  Conv
    # sites whose shape class measured faster in s8 run quantized with
    # calibrated activation scales from the flax "quant" collection.
    # Sampling/serving only — the quantized path has no VJP.
    quant_conv: Optional[str] = None

    @classmethod
    def from_config(cls, config: dict) -> "Unet":
        dtype = jnp.bfloat16 if config.get("compute_dtype") == "bfloat16" else jnp.float32
        use_pallas = resolve_use_pallas(config)
        quant = config.get("conv_quant") or None
        if quant not in (None, "int8"):
            raise ValueError(f"conv_quant must be 'int8' or unset, got {quant!r}")
        return cls(
            dim=config["unet_chan"],
            in_channels=config["unet_in"],
            dim_mults=tuple(config["unet_dims"]),
            dropout=config["unet_dropout"],
            dtype=dtype,
            use_pallas=bool(use_pallas),
            remat=bool(config.get("remat", False)),
            quant_conv=quant,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray, t: jnp.ndarray,
                 deterministic: bool = True) -> jnp.ndarray:
        """x: (B, H, W, C) in [-1, 1]; t: (B,) int timesteps."""
        dims = [self.in_channels] + [self.dim * m for m in self.dim_mults]
        in_out: Tuple[Tuple[int, int], ...] = tuple(zip(dims[:-1], dims[1:]))
        num_resolutions = len(in_out)

        t_emb = TimeMLP(self.dim)(t)

        # rematerialize ResnetBlocks under grad: trades recompute for
        # activation memory on the big 256^2 training configs.
        # Explicit names keep the param tree identical to the non-remat
        # path (nn.remat would otherwise prefix module names).
        rb_cls = nn.remat(ResnetBlock) if self.remat else ResnetBlock
        rb_idx = [0]

        def RB(*args, **kwargs):
            mod = rb_cls(*args, **kwargs, quant=self.quant_conv,
                         name=f"ResnetBlock_{rb_idx[0]}")
            rb_idx[0] += 1
            return mod

        orig_dtype = x.dtype
        x = x.astype(self.dtype)

        # contracting path
        skips = []
        for ind, (dim_in, dim_out) in enumerate(in_out):
            is_last = ind >= num_resolutions - 1
            x = RB(dim_in, dim_out, dropout=self.dropout,
                            dtype=self.dtype)(x, t_emb, deterministic)
            x = RB(dim_out, dim_out, dropout=self.dropout,
                            dtype=self.dtype)(x, t_emb, deterministic)
            x = PreNormLinearAttention(dim_out, dtype=self.dtype,
                                       use_pallas=self.use_pallas)(x)
            skips.append(x)
            if not is_last:
                x = Downsample(dim_out, dtype=self.dtype)(x)

        # bottom
        mid_dim = dims[-1]
        x = RB(mid_dim, mid_dim, dtype=self.dtype)(x, t_emb, deterministic)
        x = PreNormLinearAttention(mid_dim, dtype=self.dtype,
                                   use_pallas=self.use_pallas)(x)
        x = RB(mid_dim, mid_dim, dtype=self.dtype)(x, t_emb, deterministic)

        # expansive path (reference iterates reversed(in_out[1:])).
        # The skip is logically concatenated onto x's channels; it is
        # passed separately so the consuming convs split their kernels
        # instead of materializing the 2x-wide concat (blocks.py
        # Conv3x3Params — saves the concat tensor's HBM round trip).
        for dim_in, dim_out in reversed(in_out[1:]):
            skip = skips.pop().astype(self.dtype)
            x = RB(dim_out * 2, dim_in, dtype=self.dtype)(
                x, t_emb, deterministic, skip=skip)
            x = RB(dim_in, dim_in, dtype=self.dtype)(x, t_emb,
                                                              deterministic)
            x = PreNormLinearAttention(dim_in, dtype=self.dtype,
                                       use_pallas=self.use_pallas)(x)
            x = Upsample(dim_in, dtype=self.dtype)(x)

        # final Block + 1x1 projection back to input channels
        x = Block(self.dim, self.dim, dtype=self.dtype,
                  quant=self.quant_conv)(x)
        x = conv1x1(self.in_channels, self.dim, dtype=self.dtype,
                    name="final_conv")(x)
        return x.astype(orig_dtype)
