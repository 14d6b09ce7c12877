from livecell_tpu.data.coco import (  # noqa: F401
    CocoIndex,
    polygons_to_mask,
    rle_decode,
    rle_encode,
)
from livecell_tpu.data.dataset import PackedDataset, pad_image_batch  # noqa: F401
