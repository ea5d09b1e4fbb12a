"""Mixed-precision bit-width search example (examples/mixed_precision.py)."""

import numpy as np

from brevitas_tpu.examples.mixed_precision import main


def test_mixed_precision_search_reduces_bit_widths():
    r = main(["--epochs", "6", "--bw-lr", "0.06",
              "--weight-decay-bw", "0.15", "--act-decay-bw", "0.05"])
    # the penalty pulls precision below the 8-bit start...
    assert r["mean_weight_bit_width"] < 8.0
    assert r["mean_act_bit_width"] < 8.0
    # ...while every width stays on the legal integer grid
    for path, bw in r["per_quantizer_bit_widths"].items():
        assert 2.0 <= bw <= 8.0 and bw == round(bw), (path, bw)
    # and the task still trains (digits is easy; loose floor)
    assert r["test_acc"] > 0.85


def test_mixed_precision_no_penalty_keeps_eight_bits():
    r = main(["--epochs", "2", "--weight-decay-bw", "0.0",
              "--act-decay-bw", "0.0"])
    assert r["mean_weight_bit_width"] == 8.0
    assert r["mean_act_bit_width"] == 8.0
