"""One-command caption-parity check against the published MAGMA_v1
checkpoint (VERDICT r3 item 8 / missing item 1).

The reference's observable contract is that the documented prompt yields
"A cabin on a lake" (reference example_inference.py:16-27, README.md:97).
The sandbox is air-gapped (no checkpoint, no GPT-2 vocab, no image
download), so this script packages the whole verification for the moment
the assets exist:

    python scripts/check_caption_parity.py \
        --checkpoint /path/to/mp_rank_00_model_states.pt \
        --gpt2-dir   /path/to/gpt2            # vocab.json + merges.txt \
        [--image     /path/to/woods_hi.jpg]   # else the documented URL \
        [--config    configs/MAGMA_v1.yml]

It (1) enforces the real GPT-2 BPE (strict tokenizer — byte fallback is
an error here), (2) converts + loads the torch checkpoint through
Magma.from_checkpoint (training/torch_convert.py handles the
``sd["module"]`` unwrap and key mapping), (3) embeds the documented
prompt (shape must be (1, 149, 4096): 144 CLIP-RN50x16 image tokens + 5
text tokens), and (4) generates with the documented sampling settings.

Greedy (temperature 0) output is checked for the documented caption;
the documented sampled setting (T=0.7, top_p=0.9) is also printed.
"""
import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

DOCUMENTED_IMAGE = (
    "https://www.art-prints-on-demand.com/kunst/thomas_cole/woods_hi.jpg"
)
DOCUMENTED_PROMPT = "Describe the painting:"
DOCUMENTED_CAPTION = "A cabin on a lake"


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--checkpoint", required=True,
                    help="mp_rank_00_model_states.pt or an Orbax dir")
    ap.add_argument("--gpt2-dir", required=True,
                    help="directory with GPT-2 vocab.json + merges.txt")
    ap.add_argument("--image", default=DOCUMENTED_IMAGE,
                    help="image path/URL (default: the documented URL)")
    ap.add_argument("--config", default="configs/MAGMA_v1.yml")
    ap.add_argument("--prompt", default=DOCUMENTED_PROMPT)
    args = ap.parse_args()

    # real BPE or bust: parity is meaningless on the byte fallback
    os.environ["MAGMA_TPU_GPT2_DIR"] = args.gpt2_dir

    from magma_tpu import Magma
    from magma_tpu.config import MultimodalConfig
    from magma_tpu.data.image_input import ImageInput
    from magma_tpu.tokenizer import ByteFallbackTokenizer

    config = MultimodalConfig.from_yml(args.config)
    import dataclasses

    config = dataclasses.replace(config, strict_tokenizer=True)

    print(f"loading {args.checkpoint} ...", flush=True)
    model = Magma.from_checkpoint(config, args.checkpoint)
    assert not isinstance(model.tokenizer, ByteFallbackTokenizer)

    inputs = [ImageInput(args.image), args.prompt]
    embeddings = model.preprocess_inputs(inputs)
    print(f"prompt embeddings: {embeddings.shape}", flush=True)
    assert embeddings.shape == (1, 149, 4096), embeddings.shape

    greedy = model.generate(embeddings=embeddings, max_steps=6,
                            temperature=0.0, top_k=0)[0]
    sampled = model.generate(embeddings=embeddings, max_steps=6,
                             temperature=0.7, top_p=0.9, top_k=0)[0]
    print(f"greedy : {greedy!r}")
    print(f"sampled: {sampled!r}  (documented setting, stochastic)")

    ok = DOCUMENTED_CAPTION.lower() in greedy.lower()
    print(f"caption parity ({DOCUMENTED_CAPTION!r} in greedy): "
          f"{'PASS' if ok else 'FAIL'}")
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
