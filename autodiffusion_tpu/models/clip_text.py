"""CLIP text encoder (the SD conditioning tower) in flax.

Re-design of FrozenCLIPEmbedder (ldm/modules/encoders/modules.py:137-163):
the ViT-L/14 text transformer — token+position embeddings, 12 pre-LN
blocks with causal self-attention and quick-GELU MLPs, final LayerNorm —
returning the last hidden state [B, 77, 768] used as cross-attention
context. Weights convert from a HF CLIPTextModel state dict
(convert_clip_text below); the BPE tokenizer loads the standard
vocab.json/merges.txt pair when supplied (no network in this environment).
"""

from __future__ import annotations

import gzip
import json
from typing import Any, Dict, List, Mapping, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

Dtype = Any

__all__ = ["CLIPTextEncoder", "CLIPTextConfig", "convert_clip_text",
           "ClipBPETokenizer"]


class CLIPTextConfig:
    def __init__(self, vocab_size=49408, width=768, layers=12, heads=12,
                 mlp_ratio=4, max_length=77, act="quick_gelu"):
        self.vocab_size = vocab_size
        self.width = width
        self.layers = layers
        self.heads = heads
        self.mlp_ratio = mlp_ratio
        self.max_length = max_length
        self.act = act


def _act(name):
    if name == "quick_gelu":
        return lambda x: x * jax.nn.sigmoid(1.702 * x)
    return lambda x: nn.gelu(x, approximate=False)


class CLIPAttention(nn.Module):
    heads: int
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, x, mask):
        b, t, c = x.shape
        hd = c // self.heads
        q = nn.DenseGeneral(c, dtype=self.dtype, name="q_proj")(x)
        k = nn.DenseGeneral(c, dtype=self.dtype, name="k_proj")(x)
        v = nn.DenseGeneral(c, dtype=self.dtype, name="v_proj")(x)
        q = q.reshape(b, t, self.heads, hd)
        k = k.reshape(b, t, self.heads, hd)
        v = v.reshape(b, t, self.heads, hd)
        logits = jnp.einsum("bthd,bshd->bhts", q, k).astype(jnp.float32)
        logits = logits * (hd ** -0.5) + mask
        w = jax.nn.softmax(logits, axis=-1).astype(v.dtype)
        out = jnp.einsum("bhts,bshd->bthd", w, v).reshape(b, t, c)
        return nn.DenseGeneral(c, dtype=self.dtype, name="out_proj")(out)


class CLIPTextEncoder(nn.Module):
    config: CLIPTextConfig
    dtype: Dtype = jnp.float32

    @nn.compact
    def __call__(self, input_ids):
        cfg = self.config
        b, t = input_ids.shape
        tok = nn.Embed(cfg.vocab_size, cfg.width, dtype=self.dtype,
                       name="token_embedding")(input_ids)
        pos = self.param("position_embedding",
                         nn.initializers.normal(0.01),
                         (cfg.max_length, cfg.width), jnp.float32)
        h = tok + pos[None, :t].astype(tok.dtype)
        mask = jnp.triu(jnp.full((t, t), -jnp.inf, jnp.float32), k=1)[None, None]
        act = _act(cfg.act)
        ln = lambda name: nn.LayerNorm(epsilon=1e-5, dtype=jnp.float32, name=name)
        for i in range(cfg.layers):
            h = h + CLIPAttention(cfg.heads, self.dtype, name=f"layer_{i}_attn")(
                ln(f"layer_{i}_ln1")(h).astype(h.dtype), mask)
            m = ln(f"layer_{i}_ln2")(h).astype(h.dtype)
            m = nn.DenseGeneral(cfg.width * cfg.mlp_ratio, dtype=self.dtype,
                                name=f"layer_{i}_fc1")(m)
            m = nn.DenseGeneral(cfg.width, dtype=self.dtype,
                                name=f"layer_{i}_fc2")(act(m))
            h = h + m
        return ln("final_ln")(h)


class ClassEmbedder(nn.Module):
    """Class-conditional crossattn context: [B] int labels -> [B, 1, D]
    single-token context sequence (ldm/modules/encoders/modules.py:21-33,
    the conditioner of the class-conditional LDM configs, e.g.
    cin256-v2.yaml / cin-ldm-vq-f8.yaml with n_classes=1001 incl. the
    unconditional-class slot)."""

    embed_dim: int
    n_classes: int = 1000

    @nn.compact
    def __call__(self, y):
        emb = nn.Embed(self.n_classes, self.embed_dim,
                       name="embedding")(y.astype(jnp.int32))
        return emb[:, None, :]


def convert_clip_text(sd: Mapping[str, np.ndarray],
                      config: CLIPTextConfig) -> dict:
    """HF transformers CLIPTextModel state dict -> flax params."""

    def np_(k):
        v = sd[k]
        return v if isinstance(v, np.ndarray) else v.detach().cpu().float().numpy()

    pre = "text_model."
    if not any(k.startswith(pre) for k in sd):
        pre = ""
    params: Dict[str, Any] = {
        "token_embedding": {
            "embedding": np_(f"{pre}embeddings.token_embedding.weight")},
        "position_embedding": np_(f"{pre}embeddings.position_embedding.weight"),
        "final_ln": {"scale": np_(f"{pre}final_layer_norm.weight"),
                     "bias": np_(f"{pre}final_layer_norm.bias")},
    }

    def dense(k):
        return {"kernel": np_(k + ".weight").T, "bias": np_(k + ".bias")}

    def lnp(k):
        return {"scale": np_(k + ".weight"), "bias": np_(k + ".bias")}

    for i in range(config.layers):
        lp = f"{pre}encoder.layers.{i}."
        params[f"layer_{i}_attn"] = {
            "q_proj": dense(lp + "self_attn.q_proj"),
            "k_proj": dense(lp + "self_attn.k_proj"),
            "v_proj": dense(lp + "self_attn.v_proj"),
            "out_proj": dense(lp + "self_attn.out_proj"),
        }
        params[f"layer_{i}_ln1"] = lnp(lp + "layer_norm1")
        params[f"layer_{i}_ln2"] = lnp(lp + "layer_norm2")
        params[f"layer_{i}_fc1"] = dense(lp + "mlp.fc1")
        params[f"layer_{i}_fc2"] = dense(lp + "mlp.fc2")
    return {"params": params}


class ClipBPETokenizer:
    """Minimal CLIP byte-pair tokenizer from user-supplied vocab files.

    Accepts either the HF pair (vocab.json + merges.txt) or the original
    OpenAI ``bpe_simple_vocab_16e6.txt.gz``. Produces the padded 77-token
    ids FrozenCLIPEmbedder gets from CLIPTokenizer (modules.py:146-155).
    """

    def __init__(self, encoder: Dict[str, int], merges: List[Tuple[str, str]],
                 max_length: int = 77):
        self.encoder = encoder
        self.bpe_ranks = {m: i for i, m in enumerate(merges)}
        self.max_length = max_length
        self.sot = encoder["<|startoftext|>"]
        self.eot = encoder["<|endoftext|>"]
        self.byte_encoder = _bytes_to_unicode()
        self.cache: Dict[str, str] = {}

    @classmethod
    def from_files(cls, vocab_json: str, merges_txt: str,
                   max_length: int = 77) -> "ClipBPETokenizer":
        with open(vocab_json) as f:
            encoder = json.load(f)
        opener = gzip.open if merges_txt.endswith(".gz") else open
        with opener(merges_txt, "rt") as f:
            lines = f.read().split("\n")
        merges = [tuple(l.split()) for l in lines
                  if l and not l.startswith("#") and len(l.split()) == 2]
        # CLIP uses only the first 49152-256-2 merges of the (longer)
        # bpe_simple_vocab_16e6 file (simple_tokenizer: merges[1:49152-256-2+1]);
        # keeping the tail would let out-of-vocab merges win, whose tokens
        # the encoder lacks — prompts would silently drop tokens
        merges = merges[: 49152 - 256 - 2]
        return cls(encoder, merges, max_length)

    def _bpe(self, token: str) -> str:
        if token in self.cache:
            return self.cache[token]
        word = tuple(token[:-1]) + (token[-1] + "</w>",)
        while len(word) > 1:
            pairs = set(zip(word[:-1], word[1:]))
            best = min(pairs, key=lambda p: self.bpe_ranks.get(p, float("inf")))
            if best not in self.bpe_ranks:
                break
            first, second = best
            new_word: List[str] = []
            i = 0
            while i < len(word):
                if (i < len(word) - 1 and word[i] == first
                        and word[i + 1] == second):
                    new_word.append(first + second)
                    i += 2
                else:
                    new_word.append(word[i])
                    i += 1
            word = tuple(new_word)
        out = " ".join(word)
        self.cache[token] = out
        return out

    def encode_text(self, text: str) -> List[int]:
        import re
        text = " ".join(text.lower().strip().split())
        ids: List[int] = []
        for tok in re.findall(_CLIP_PRE_TOKEN_PAT, text):
            tok = "".join(self.byte_encoder[b] for b in tok.encode("utf-8"))
            ids.extend(self.encoder[t] for t in self._bpe(tok).split(" ")
                       if t in self.encoder)
        return ids

    def __call__(self, texts: List[str]) -> np.ndarray:
        out = np.full((len(texts), self.max_length), self.eot, dtype=np.int32)
        for i, text in enumerate(texts):
            ids = [self.sot] + self.encode_text(text)[: self.max_length - 2] + [self.eot]
            out[i, : len(ids)] = ids
        return out


# CLIP's pre-tokenizer pattern (simple_tokenizer.py), compiled once:
# letters group ([\p{L}]+ -> [^\W\d_]+), digits split ONE AT A TIME
# ([\p{N}] -> \d), punctuation runs grouped including underscore
# ([^\s\p{L}\p{N}]+ -> (?:[^\s\w]|_)+). The distinction matters:
# "photo4k" must tokenize as photo|4|k, not as one word.
import re as _re  # noqa: E402

_CLIP_PRE_TOKEN_PAT = _re.compile(
    r"""<\|startoftext\|>|<\|endoftext\|>|'s|'t|'re|'ve|'m|'ll|'d|"""
    r"""[^\W\d_]+|\d|(?:[^\s\w]|_)+""", _re.IGNORECASE)


def _bytes_to_unicode() -> Dict[int, str]:
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("\xa1"), ord("\xac") + 1))
          + list(range(ord("\xae"), ord("\xff") + 1)))
    cs = bs[:]
    n = 0
    for b in range(2 ** 8):
        if b not in bs:
            bs.append(b)
            cs.append(2 ** 8 + n)
            n += 1
    return dict(zip(bs, [chr(c) for c in cs]))
