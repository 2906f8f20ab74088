"""Registry parity with the reference layouts (data_utils.py:558-617)."""

import pytest

from climsim_tpu.varspec import get_varspec

EXPECTED = {
    # version: (input_len, output_len, ps_index)
    "v1": (124, 128, 120),
    "v2": (557, 368, 360),
    # Note: the reference's set_to_v2_rh_vars claims ps_index=360
    # (data_utils.py:589) but its own v2_rh_inputs ordering places ozone/
    # CH4/N2O *before* state_ps (data_utils.py:217-242), putting ps at
    # 9*60=540 in the flattened layout.  We use the ordering-derived truth.
    "v2_rh": (557, 368, 540),
    "v4": (1525, 368, 1500),
    "v5": (1405, 308, 1380),
}


@pytest.mark.parametrize("ver", sorted(EXPECTED))
def test_feature_lengths(ver):
    spec = get_varspec(ver)
    in_len, out_len, ps = EXPECTED[ver]
    assert spec.input_len == in_len
    assert spec.output_len == out_len
    assert spec.ps_index == ps


def test_offsets_contiguous():
    spec = get_varspec("v2")
    off = 0
    for v in spec.inputs:
        sl = spec.input_slices[v]
        assert sl.start == off
        off = sl.stop
    assert off == spec.input_len


def test_v1_output_order():
    spec = get_varspec("v1")
    sl = spec.output_slices
    assert sl["ptend_t"] == slice(0, 60)
    assert sl["ptend_q0001"] == slice(60, 120)
    assert sl["cam_out_NETSW"] == slice(120, 121)
    assert sl["cam_out_SOLLD"] == slice(127, 128)


def test_v5_wrapper_blocks():
    """Offsets the online v5 wrapper depends on (v5_nn_wrapper.ipynb)."""
    spec = get_varspec("v5")
    sl_in = spec.input_slices
    assert sl_in["state_t"] == slice(0, 60)
    assert sl_in["state_rh"] == slice(60, 120)
    assert sl_in["state_qn"] == slice(120, 180)
    assert sl_in["liq_partition"] == slice(180, 240)
    sl_out = spec.output_slices
    assert sl_out["ptend_qn"] == slice(120, 180)
    assert sl_out["ptend_u"] == slice(180, 240)


def test_v4_scalar_tail():
    spec = get_varspec("v4")
    assert spec.inputs[-3:] == ("clat", "slat", "icol")
    assert spec.input_slices["icol"] == slice(1524, 1525)


def test_profile_scalar_partition():
    spec = get_varspec("v1")
    assert spec.input_profile_vars == ("state_t", "state_q0001")
    assert spec.input_scalar_vars == (
        "state_ps", "pbuf_SOLIN", "pbuf_LHFLX", "pbuf_SHFLX")
    assert spec.output_profile_vars == ("ptend_t", "ptend_q0001")
    assert len(spec.output_scalar_vars) == 8
