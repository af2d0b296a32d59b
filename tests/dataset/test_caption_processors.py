"""Caption processor behaviors (reference tests/dataset/test_caption_preprocessor.py model)."""

import random

from vision_ft_tpu.dataset.caption import (
    CaptionDrop,
    CaptionPassthrough,
    CaptionPrefix,
    CaptionRandomPrefix,
    CaptionReplace,
    CaptionShuffle,
    CaptionShuffleInGroup,
    CaptionSuffix,
    CaptionTagDrop,
)
from vision_ft_tpu.dataset.tags import format_general_character_tags, replace_underscore


def test_passthrough_prefix_suffix_replace():
    assert CaptionPassthrough().process("a, b") == "a, b"
    assert CaptionPrefix(prefix="best, ").process("a") == "best, a"
    assert CaptionSuffix(suffix=", wm").process("a") == "a, wm"
    assert CaptionReplace(source="1girl", target="1boy").process("1girl, smile") == "1boy, smile"


def test_random_prefix_choice_seeded():
    random.seed(0)
    p = CaptionRandomPrefix(prefix=["x, ", "y, "])
    outs = {p.process("a") for _ in range(20)}
    assert outs == {"x, a", "y, a"}


def test_shuffle_preserves_tag_set():
    random.seed(0)
    proc = CaptionShuffle()
    out = proc.process("a, b, c, d")
    assert sorted(t.strip() for t in out.split(",")) == ["a", "b", "c", "d"]


def test_shuffle_in_group_keeps_group_order():
    random.seed(0)
    proc = CaptionShuffleInGroup()
    out = proc.process("1girl|||miku|||smile, long hair")
    # groups concat in order; first group stays first
    assert out.startswith("1girl")
    assert "miku" in out


def test_drop_rates():
    random.seed(0)
    assert CaptionDrop(drop_rate=1.0).process("abc") == ""
    assert CaptionDrop(drop_rate=0.0).process("abc") == "abc"
    assert CaptionTagDrop(drop_rate=1.0).process("a,b,c") == ""
    assert CaptionTagDrop(drop_rate=0.0).process("a,b,c") == "a,b,c"


def test_tag_formatting():
    out = format_general_character_tags(
        general=["1girl", "smile", "long hair"],
        character=["miku"],
        rating="general",
    )
    assert out == "1girl|||miku|||smile, long hair"
    assert replace_underscore("long_hair") == "long hair"
    assert replace_underscore(">_<") == ">_<"  # kaomoji kept
