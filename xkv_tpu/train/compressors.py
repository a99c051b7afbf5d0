"""Learned KV-cache compressor zoo (flax.linen).

TPU-native rebuild of the reference fork's compressor stack
(`src/compressors/compressor.py:47-822` — abstract compress/decompress over
the per-layer K‖V stack, strided-conv encoders/decoders, a VAE variant with
reparameterized latent + KL, and the Dual1D design that convolves along the
layer axis then the sequence axis). The reference modules are broken-import
WIP (SURVEY.md §2.4); these are working equivalents:

  * input layout: (batch, num_layers, seq, features) where features =
    2 * hkv * hd (K concatenated with V, reference `compressor.py:47-89`).
  * ``compress``   -> latent (batch, L', s', f') with a static, shape-derived
    compression ratio.
  * ``decompress`` -> reconstruction back to the input shape.
  * VAE variant returns (recon, mu, logvar) for the KL term.
"""

from __future__ import annotations

from typing import Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


class IdentityCompressor(nn.Module):
    """Passthrough baseline (reference `src/compressors/identity_compressor.py`)."""

    @nn.compact
    def __call__(self, x, train: bool = False):
        return x

    def compress(self, variables, x):
        return x

    def decompress(self, variables, z):
        return z

    @staticmethod
    def compression_ratio() -> float:
        return 1.0


class ConvCompressor(nn.Module):
    """2D strided-conv encoder/decoder over (layers, seq)
    (reference `ConvolutionalCompressor`, `compressor.py:114-224`)."""

    features: int = 64
    latent_features: int = 16
    strides: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.gelu(
            nn.Conv(self.features, (3, 3), strides=self.strides, name="enc1")(x)
        )
        z = nn.Conv(self.latent_features, (3, 3), name="enc2")(h)
        h = nn.gelu(
            nn.ConvTranspose(self.features, (3, 3), strides=self.strides, name="dec1")(z)
        )
        out = nn.Dense(x.shape[-1], name="dec_out")(h)
        # Crop/pad to the exact input spatial dims (stride remainders).
        out = out[:, : x.shape[1], : x.shape[2], :]
        pad = [
            (0, 0),
            (0, x.shape[1] - out.shape[1]),
            (0, x.shape[2] - out.shape[2]),
            (0, 0),
        ]
        return jnp.pad(out, pad)


class Dual1DConvCompressor(nn.Module):
    """1D conv along the layer axis, then along the sequence axis
    (reference `Dual1DConvolutionalCompressor`, `compressor.py:643-822`).
    This is the variant with the reference fork's only recorded training run
    (`lightning_logs/version_0`, compression_ratio 32)."""

    layer_stride: int = 2
    seq_stride: int = 2
    feature_ratio: int = 8  # latent features = in_features // feature_ratio
    activation: str = "gelu"  # reference ablates activations

    def _act(self, x):
        return {
            "gelu": nn.gelu,
            "relu": nn.relu,
            "silu": nn.silu,
            "none": lambda v: v,
        }[self.activation](x)

    @nn.compact
    def __call__(self, x, train: bool = False):
        b, L, s, f = x.shape
        latent_f = max(1, f // self.feature_ratio)

        # --- encode: conv along layers (treat seq as batch), then seq
        h = jnp.transpose(x, (0, 2, 1, 3)).reshape(b * s, L, f)
        h = self._act(
            nn.Conv(f, (3,), strides=(self.layer_stride,), name="enc_layer")(h)
        )
        L2 = h.shape[1]
        h = h.reshape(b, s, L2, f).transpose(0, 2, 1, 3).reshape(b * L2, s, f)
        h = self._act(
            nn.Conv(latent_f, (3,), strides=(self.seq_stride,), name="enc_seq")(h)
        )
        s2 = h.shape[1]
        z = h.reshape(b, L2, s2, latent_f)

        # --- decode: transpose convs in reverse order
        h = z.reshape(b * L2, s2, latent_f)
        h = self._act(
            nn.ConvTranspose(f, (3,), strides=(self.seq_stride,), name="dec_seq")(h)
        )
        h = h[:, :s, :]
        h = h.reshape(b, L2, s, f).transpose(0, 2, 1, 3).reshape(b * s, L2, f)
        h = nn.ConvTranspose(f, (3,), strides=(self.layer_stride,), name="dec_layer")(h)
        h = h[:, :L, :]
        out = h.reshape(b, s, L, f).transpose(0, 2, 1, 3)
        return out

    def compression_ratio(self) -> float:
        return float(self.layer_stride * self.seq_stride * self.feature_ratio)


class VAEConvCompressor(nn.Module):
    """Conv compressor with variational latent (mu/logvar heads, reparam,
    KL) — reference `VAEConvolutionalCompressor`, `compressor.py:438-625`."""

    features: int = 64
    latent_features: int = 16
    strides: Tuple[int, int] = (2, 2)

    @nn.compact
    def __call__(self, x, train: bool = False, rng_key=None):
        h = nn.gelu(
            nn.Conv(self.features, (3, 3), strides=self.strides, name="enc")(x)
        )
        mu = nn.Conv(self.latent_features, (3, 3), name="mu")(h)
        logvar = nn.Conv(self.latent_features, (3, 3), name="logvar")(h)
        if train:
            if rng_key is None:
                rng_key = self.make_rng("reparam")
            eps = jax.random.normal(rng_key, mu.shape, mu.dtype)
            z = mu + jnp.exp(0.5 * logvar) * eps
        else:
            z = mu
        h = nn.gelu(
            nn.ConvTranspose(self.features, (3, 3), strides=self.strides, name="dec")(z)
        )
        out = nn.Dense(x.shape[-1], name="dec_out")(h)
        out = out[:, : x.shape[1], : x.shape[2], :]
        pad = [
            (0, 0),
            (0, x.shape[1] - out.shape[1]),
            (0, x.shape[2] - out.shape[2]),
            (0, 0),
        ]
        return jnp.pad(out, pad), mu, logvar


def kl_divergence(mu: jax.Array, logvar: jax.Array) -> jax.Array:
    """KL(N(mu, sigma) || N(0, 1)) per batch element, meaned
    (reference `compressor.py:561-625`)."""
    return -0.5 * jnp.mean(1 + logvar - mu**2 - jnp.exp(logvar))


def make_compressor(kind: str, **kwargs):
    kinds = {
        "identity": IdentityCompressor,
        "conv": ConvCompressor,
        "enhanced": EnhancedConvCompressor,
        "dual1d": Dual1DConvCompressor,
        "vae": VAEConvCompressor,
    }
    if kind not in kinds:
        raise ValueError(f"unknown compressor {kind!r}; options {list(kinds)}")
    return kinds[kind](**kwargs)


class EnhancedConvCompressor(nn.Module):
    """Conv compressor with residual refinement and channel attention
    (reference `EnhancedConvolutionalCompressor`, `compressor.py:243-417`:
    multi-stage strided conv + SE-style channel gating + residual blocks)."""

    features: int = 64
    latent_features: int = 16
    strides: Tuple[int, int] = (2, 2)
    num_res_blocks: int = 2
    se_ratio: int = 4

    def _channel_attention(self, x, name):
        # Squeeze-and-excite over the feature axis (reference :398-417).
        pooled = jnp.mean(x, axis=(1, 2))  # (b, f)
        f = x.shape[-1]
        h = nn.relu(nn.Dense(max(1, f // self.se_ratio), name=f"{name}_se1")(pooled))
        gate = jax.nn.sigmoid(nn.Dense(f, name=f"{name}_se2")(h))
        return x * gate[:, None, None, :]

    def _res_block(self, x, name):
        h = nn.gelu(nn.Conv(x.shape[-1], (3, 3), name=f"{name}_c1")(x))
        h = nn.Conv(x.shape[-1], (3, 3), name=f"{name}_c2")(h)
        return nn.gelu(x + h)

    @nn.compact
    def __call__(self, x, train: bool = False):
        h = nn.gelu(
            nn.Conv(self.features, (3, 3), strides=self.strides, name="enc")(x)
        )
        for i in range(self.num_res_blocks):
            h = self._res_block(h, f"enc_res{i}")
        h = self._channel_attention(h, "enc_ca")
        z = nn.Conv(self.latent_features, (3, 3), name="to_latent")(h)

        h = nn.gelu(
            nn.ConvTranspose(self.features, (3, 3), strides=self.strides,
                             name="dec")(z)
        )
        for i in range(self.num_res_blocks):
            h = self._res_block(h, f"dec_res{i}")
        out = nn.Dense(x.shape[-1], name="dec_out")(h)
        out = out[:, : x.shape[1], : x.shape[2], :]
        pad = [
            (0, 0),
            (0, x.shape[1] - out.shape[1]),
            (0, x.shape[2] - out.shape[2]),
            (0, 0),
        ]
        return jnp.pad(out, pad)
