from .shift import (  # noqa: F401
    modf_shift_components,
    roll_lerp,
    roll_lerp_views,
    shift_lf,
    integer_shift_lf,
    view_offsets,
)
from .codecs import reg_to_class, class_to_reg, mpi_to_weights  # noqa: F401
from .masks import create_mask_margin, create_mask_texture  # noqa: F401
