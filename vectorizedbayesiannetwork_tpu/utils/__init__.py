from ..core.utils import (
    as_array,
    broadcast_samples,
    concat_parents,
    df_to_array_dict,
    ensure_2d,
    flatten_samples,
    infer_batch_size,
    unflatten_samples,
)
