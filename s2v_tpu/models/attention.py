"""Cross-attention between masked-input and reference features
(reference: models/transformer.py).

Used at the deepest level of LNet's Visual_Encoder (LNet.py:21-24):
dim=512, depth=2, heads=4, dim_head=64, mlp_dim=256 over 12x12=144 spatial
tokens. q, k come from the masked stream; v from the reference stream
(transformer.py:77-79). GELU is the tanh approximation (transformer.py:11-15).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import flax.linen as nn

from s2v_tpu.models.layers import Dense


class LayerNorm(nn.Module):
    """torch nn.LayerNorm over the last dim (elementwise affine)."""

    features: int
    eps: float = 1e-5

    @nn.compact
    def __call__(self, x):
        weight = self.param("weight", nn.initializers.ones, (self.features,))
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        mean = x.mean(axis=-1, keepdims=True)
        var = x.var(axis=-1, keepdims=True)
        y = (x - mean) * jax.lax.rsqrt(var + self.eps)
        return y * weight.astype(x.dtype) + bias.astype(x.dtype)


class FeedForward(nn.Module):
    dim: int
    hidden_dim: int

    @nn.compact
    def __call__(self, x):
        x = Dense(self.hidden_dim, name="fc1")(x)
        x = jax.nn.gelu(x, approximate=True)  # tanh GELU (transformer.py:15)
        return Dense(self.dim, name="fc2")(x)


class CrossAttention(nn.Module):
    """transformer.py:54-87: q, k from x; v from y."""

    dim: int
    heads: int = 4
    dim_head: int = 64

    @nn.compact
    def __call__(self, x, y):
        b, n, _ = x.shape
        inner = self.heads * self.dim_head
        q = Dense(inner, use_bias=False, name="to_q")(x)
        k = Dense(inner, use_bias=False, name="to_k")(x)
        v = Dense(inner, use_bias=False, name="to_v")(y)

        def split(t):
            return t.reshape(b, n, self.heads, self.dim_head).transpose(0, 2, 1, 3)

        q, k, v = split(q), split(k), split(v)
        scale = self.dim_head ** -0.5
        dots = jnp.einsum("bhnd,bhmd->bhnm", q, k) * scale
        attn = jax.nn.softmax(dots, axis=-1)
        out = jnp.einsum("bhnm,bhmd->bhnd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, inner)
        if inner != self.dim or self.heads != 1:
            out = Dense(self.dim, name="to_out")(out)
        return out


class CrossTransformer(nn.Module):
    """transformer.py:89-112 on flattened spatial tokens.

    x is the masked-input feature map, y the reference feature map, both
    [B, H, W, C]; returns the refined x.
    """

    dim: int
    depth: int = 2
    heads: int = 4
    dim_head: int = 64
    mlp_dim: int = 256

    @nn.compact
    def __call__(self, x, y):
        b, h, w, c = x.shape
        xt = x.reshape(b, h * w, c)
        yt = y.reshape(b, h * w, c)
        for i in range(self.depth):
            attn = CrossAttention(self.dim, self.heads, self.dim_head,
                                  name=f"attn{i}")
            xt = attn(
                LayerNorm(self.dim, name=f"normx{i}")(xt),
                LayerNorm(self.dim, name=f"normy{i}")(yt),
            ) + xt
            xt = FeedForward(self.dim, self.mlp_dim, name=f"ff{i}")(
                LayerNorm(self.dim, name=f"normf{i}")(xt)
            ) + xt
        return xt.reshape(b, h, w, c)
