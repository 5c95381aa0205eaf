"""SPPFPN neck (fork ``necks/fpn.py:208``): SPP-type lateral variants."""
import os
import sys

import numpy as np
import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

from boosting_rcnn_tpu.models.necks.fpn import SPPFPN


@pytest.mark.parametrize("spp_type", ["ASPP", "ASPP_share", "SPP", "RFB"])
def test_sppfpn_variants_forward(spp_type):
    neck = SPPFPN(
        in_channels=[8, 16, 32, 64], out_channels=16, num_outs=5,
        spp_type=spp_type,
    )
    inputs = tuple(
        jnp.asarray(np.random.RandomState(i).rand(1, 16 // (2 ** i) + 8,
                                                  20 // (2 ** i) + 8, c),
                    jnp.float32)
        for i, c in enumerate([8, 16, 32, 64])
    )
    variables = neck.init(jax.random.PRNGKey(0), inputs)
    outs = neck.apply(variables, inputs)
    assert len(outs) == 5
    for i, o in enumerate(outs):
        assert o.shape[-1] == 16, (spp_type, i, o.shape)
        assert np.isfinite(np.asarray(o)).all()


def test_sppfpn_aspp_share_one_kernel():
    """ASPP_share uses ONE 3x3 weight set across all dilations (reference
    ``ASPP_share:471`` reuses shared_conv's weight at every rate)."""
    neck = SPPFPN(in_channels=[8], out_channels=16, num_outs=1,
                  spp_type="ASPP_share", add_extra_convs=False)
    x = (jnp.ones((1, 12, 12, 8)),)
    variables = neck.init(jax.random.PRNGKey(0), x)
    flat = jax.tree_util.tree_leaves_with_path(variables["params"])
    shared = [p for p, _ in flat if "shared_kernel" in str(p)]
    assert len(shared) == 1
