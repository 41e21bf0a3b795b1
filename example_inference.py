"""Canonical inference usage (parity: reference example_inference.py).

Loads a checkpoint, embeds an interleaved image+text prompt, generates.
With the MAGMA_v1 checkpoint converted via
``python -m magma_tpu.training.torch_convert <ckpt.pt> <out_dir>``, the
documented prompt below yields the documented caption ("A cabin on a
lake") given output-fidelity parity.
"""

from magma_tpu import Magma
from magma_tpu.data.image_input import ImageInput

model = Magma.from_checkpoint(
    config_path="configs/MAGMA_v1.yml",
    checkpoint_path="./mp_rank_00_model_states.pt",
)

inputs = [
    # supports urls and path/to/image
    ImageInput("https://www.art-prints-on-demand.com/kunst/thomas_cole/woods_hi.jpg"),
    "Describe the painting:",
]

# returns an embedding tensor of shape (1, 149, 4096):
# 144 CLIP-RN50x16 image tokens + 5 text tokens
embeddings = model.preprocess_inputs(inputs)

# returns a list of length embeddings.shape[0] (batch size)
output = model.generate(
    embeddings=embeddings,
    max_steps=6,
    temperature=0.7,
    top_k=0,
)

print(output[0])  # A cabin on a lake
