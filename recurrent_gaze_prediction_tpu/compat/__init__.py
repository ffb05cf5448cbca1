from .caffemodel import (
    c3d_params_from_caffemodel,
    parse_caffemodel,
    write_caffemodel,
)
from .tfrecord import (
    read_reference_tfrecord,
    write_reference_tfrecord,
)
from .tf_import import (
    grcn_params_from_tf,
    load_tf_variables,
    shallownet_params_from_tf,
    tf_deconv_kernel_to_jax,
)

__all__ = [
    "parse_caffemodel",
    "write_caffemodel",
    "c3d_params_from_caffemodel",
    "load_tf_variables",
    "shallownet_params_from_tf",
    "grcn_params_from_tf",
    "tf_deconv_kernel_to_jax",
    "read_reference_tfrecord",
    "write_reference_tfrecord",
]
