"""ClipBPETokenizer parity against the real HF CLIPTokenizer.

The OpenAI vocab file is unavailable offline, so a complete byte-level base
vocabulary (256 chars + 256 '</w>' variants + a few merges + specials) is
synthesized and loaded into BOTH tokenizers. This exercises the parts that
can silently diverge: the pre-token regex (letters vs digits vs punctuation
grouping — e.g. 'photo4k' and '...'), byte encoding, and BPE merge order.
Reference: sd/ldm/modules/encoders/modules.py:137-163 (FrozenCLIPEmbedder
tokenizes with transformers.CLIPTokenizer).
"""

import json

import pytest

from autodiffusion_tpu.models.clip_text import ClipBPETokenizer, _bytes_to_unicode

PROMPTS = [
    "a photograph of an astronaut riding a horse",
    "photo4k ultra-detailed, 35mm!!! f/1.8",
    "wait... what?!",
    "rock'n'roll isn't dead",
    "snake_case_name and 1234 numbers",
    "A   Weird   SPACING\tprompt\n",
    "don't it's we're i'll they'd you've i'm",
]

MERGES = [("h", "e"), ("t", "he</w>"), ("he", "r"),
          ("o", "f</w>"), ("a", "n</w>"), ("1", "2"),
          (".", "."), ("..", ".</w>"), ("!", "!</w>")]


@pytest.fixture(scope="module")
def vocab_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("clip_vocab")
    chars = list(_bytes_to_unicode().values())
    tokens = chars + [c + "</w>" for c in chars] + \
        ["".join(m) for m in MERGES] + ["<|startoftext|>", "<|endoftext|>"]
    vocab = {t: i for i, t in enumerate(tokens)}
    vocab_path = d / "vocab.json"
    vocab_path.write_text(json.dumps(vocab))
    merges_path = d / "merges.txt"
    merges_path.write_text("#version: 0.2\n" +
                           "\n".join(f"{a} {b}" for a, b in MERGES) + "\n")
    return str(vocab_path), str(merges_path)


@pytest.fixture(scope="module")
def pair(vocab_files):
    transformers = pytest.importorskip("transformers")
    vocab_path, merges_path = vocab_files
    ours = ClipBPETokenizer.from_files(vocab_path, merges_path, max_length=77)
    theirs = transformers.CLIPTokenizer(vocab_path, merges_path)
    return ours, theirs


class TestClipTokenizerParity:
    @pytest.mark.parametrize("prompt", PROMPTS)
    def test_token_ids_match_hf(self, pair, prompt):
        ours, theirs = pair
        ref = theirs(prompt, padding="max_length", truncation=True,
                     max_length=77)["input_ids"]
        got = ours([prompt])[0].tolist()
        assert got == ref, (prompt, got[:20], ref[:20])

    def test_batch_shape_and_padding(self, pair):
        ours, _ = pair
        out = ours(["of the", ""])
        assert out.shape == (2, 77)
        # empty prompt: sot + eot then eot padding
        assert out[1, 0] == ours.sot and out[1, 1] == ours.eot
