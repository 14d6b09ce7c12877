from livecell_tpu.models.mask_rcnn import CustomMaskRCNN, create_model  # noqa: F401
