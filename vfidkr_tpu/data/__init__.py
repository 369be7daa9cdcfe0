from vfidkr_tpu.data.vimeo90k import (
    BalancedSampler,
    Vimeo90KDataset,
    load_triplet,
    prefetch,
    read_triplet_list,
    vimeo90k_splits,
)

__all__ = ["Vimeo90KDataset", "BalancedSampler", "load_triplet", "prefetch",
           "read_triplet_list", "vimeo90k_splits"]
