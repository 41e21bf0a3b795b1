from magma_tpu.data.dataset import ImgCptDataset, collate_fn
from magma_tpu.data.convert import convert_dataset
from magma_tpu.data.image_input import ImageInput

__all__ = ["ImgCptDataset", "collate_fn", "convert_dataset", "ImageInput"]
