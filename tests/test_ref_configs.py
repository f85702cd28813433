"""Reference parameter regimes parse and run (VERDICT item 8).

The reference ships 60-bit q0 / 30-bit-prime / LogScale-30 parameter sets
(`/root/reference/configs/resnet.yml:3-13`, `lola2.yml:3-10`).  On 32-bit
lanes the 60-bit q0 splits into two ~30-bit primes behind `base_level`;
the 30-bit user primes fit the lanes directly.  These tests pin (a) that
every reference config parses to a valid context, and (b) that ct
arithmetic at LogScale 30 with a split 60-bit q0 keeps the reference's
accuracy contract.
"""

import numpy as np
import pytest

import orion_tpu as orion
from orion_tpu.runtime.config import parse_config

REF_RESNET = {
    "ckks_params": {
        "LogN": 13,
        "LogQ": [60] + [30] * 32,
        "LogP": [60, 60],
        "LogScale": 30,
        "H": 192,
        "RingType": "standard",
    },
    "boot_params": {"LogP": [61] * 8},
    "orion": {"margin": 2, "embedding_method": "hybrid", "backend": "tpu"},
}


def test_reference_resnet_params_parse():
    p = parse_config(REF_RESNET)
    assert p.base_level == 1              # 60-bit q0 -> two ~30-bit primes
    assert p.l_eff == 32                  # reference level accounting kept
    assert all(b <= 30 for b in p.split_logq)
    assert p.logscale == 30
    # boot LogP folds into the special-prime basis (alpha grows)
    assert len(p.logp) == 4 + 24          # 60 -> 2 parts, 61 -> 3 parts
    assert sum(p.logp) == 2 * 60 + 8 * 61


def test_logscale30_split_q0_ops():
    """Encrypted square at the reference's LogScale-30 regime."""
    cfg = {
        "ckks_params": {
            "LogN": 9,
            "LogQ": [60, 30, 30, 30],
            "LogP": [60],
            "LogScale": 30,
            "H": 64,
            "RingType": "standard",
        },
        "orion": {"margin": 2, "backend": "tpu"},
    }
    from orion_tpu.runtime.scheme import Scheme
    sch = Scheme().init_scheme(cfg)
    assert sch.params.base_level == 1
    rng = np.random.default_rng(9)
    x = rng.uniform(-1, 1, sch.ctx.slots)
    ct = sch.encryptor.encrypt(sch.encoder.encode(x))
    out = (ct * ct) * ct                  # x^3: two rescales at 2^30
    got = np.asarray(out.decrypt().decode()).reshape(-1)
    err = float(np.max(np.abs(got - x ** 3)))
    assert err < 1e-4, err
