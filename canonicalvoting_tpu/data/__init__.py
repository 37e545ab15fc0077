from canonicalvoting_tpu.data.geometry import (  # noqa: F401
    apply_trans,
    calc_Mbbox,
    calc_Mbbox_no_rot,
    get_top8_classes_mapping,
    make_M_from_tqs,
    quat_to_rotmat,
    roty,
    symmetry_matrices,
)
