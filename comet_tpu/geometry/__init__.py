from .quaternions import (
    quat_normalize,
    quat_multiply,
    quat_conjugate,
    quat_invert,
    quat_to_matrix,
    matrix_to_quat,
    quat_standardize,
    random_quaternions,
    geodesic_angle_from_matrices,
    rotation_angle_from_quats,
    euler_xyz_from_matrix,
    se3_matrix_row_convention,
    se3_inverse_row_convention,
)
from .embeddings import (
    sincos_1d_from_grid,
    sincos_time_embed,
    sincos_2d_pos_embed,
    sincos_2d_pos_embed_grid,
    embed_2d_coords,
    harmonic_embedding,
)
from .cameras import CameraSet, make_camera_set
from .codecs import (
    Intrinsics,
    INTRINSICS_TABLE,
    encode_relative_uvz,
    decode_relative_uvz,
    encode_relative_xyz,
    decode_relative_xyz,
    encode_abst_quar_onefl,
    decode_abst_quar_onefl,
    create_intri_matrix,
    get_efp,
)
from .fov_cameras import (
    FoVPerspectiveCameras,
    FoVOrthographicCameras,
    OrthographicCameras,
    fov_perspective_projection,
    fov_orthographic_projection,
    sfm_calibration_matrix,
    ndc_to_screen_transform,
    screen_to_ndc_transform,
    ndc_to_grid_sample_coords,
    ndc_grid_sample,
)
