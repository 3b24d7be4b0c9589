"""Appearance-only loop-closure mapping over an image directory.

Capability parity: the reference's BOWMapping example
(/root/reference/examples/BOWMapping/main.cpp:84-117) — feed a directory
of images through the engine with RGBD/Enabled=false and report detected
loop closures.

Usage: python -m rtabmap_tpu.tools.bow_mapping [dir] [--Group/Name value...]
"""
from __future__ import annotations

import glob
import os
import sys
from typing import List, Optional, Tuple

import numpy as np


def run(image_dir: str, params=None, max_kp: int = 400, max_images: int = 0,
        verbose: bool = True) -> List[Tuple[int, int, float]]:
    """Returns list of (frame_id, loop_with_id, hypothesis_value)."""
    import jax
    import jax.numpy as jnp
    from PIL import Image

    from rtabmap_tpu.core.frame import FeatureExtractor
    from rtabmap_tpu.engine.rtabmap import Rtabmap
    from rtabmap_tpu.geometry import camera as C
    from rtabmap_tpu.ops import image as im
    from rtabmap_tpu.utils.params import Parameters

    p = params or Parameters()
    p.set("RGBD/Enabled", False)

    files = sorted(
        glob.glob(os.path.join(image_dir, "*.jpg")) +
        glob.glob(os.path.join(image_dir, "*.png")),
        key=lambda f: (len(os.path.basename(f)), f),
    )
    if max_images:
        files = files[:max_images]
    if not files:
        raise FileNotFoundError(f"no images in {image_dir}")

    im0 = np.asarray(Image.open(files[0]))
    H, W = im0.shape[:2]
    cam = C.CameraModel.make(W, W, W / 2 - 0.5, H / 2 - 0.5, W, H)  # nominal
    slam = Rtabmap(cam, p, node_capacity=max(len(files) + 16, 128),
                   words_per_frame=max_kp)
    # Kp/DetectorStrategy dispatch: classical response maps or the
    # learned SuperPoint front end (strategy 11)
    fe = FeatureExtractor(cam, p, max_kp=max_kp)
    zero_depth = jnp.zeros((H, W), jnp.float32)

    closures = []
    for i, f in enumerate(files):
        arr = np.asarray(Image.open(f))
        gray = im.rgb_to_gray(jnp.asarray(arr)) if arr.ndim == 3 else (
            jnp.asarray(arr, jnp.float32) / 255.0)
        fr, descf = fe.extract(gray, zero_depth)
        st = slam.process(fr, np.eye(3, 4, dtype=np.float32), np.eye(6) * 9e-5,
                          stamp=float(i), descf=descf)
        hyp = st.get("Loop/Highest hypothesis value/", 0.0)
        if st.loop_closure_id:
            closures.append((st.ref_id, st.loop_closure_id, hyp))
            if verbose:
                print(f"frame {i+1} ({os.path.basename(f)}): LOOP CLOSURE with node "
                      f"{st.loop_closure_id} (hypothesis {hyp:.3f})")
        elif verbose and (i + 1) % 20 == 0:
            print(f"frame {i+1}: wm={int(st.get('Memory/Working memory size/'))} "
                  f"dict={int(st.get('Keypoint/Dictionary size/words'))} hyp={hyp:.3f}")
    if verbose:
        print(f"\n{len(closures)} loop closures over {len(files)} images; "
              f"dictionary={slam.memory.vocab.n_words} words")
    return closures


def main(argv=None):
    from rtabmap_tpu.utils.params import Parameters

    argv = argv if argv is not None else sys.argv[1:]
    params, rest = Parameters.parse_arguments(argv)
    image_dir = rest[0] if rest else "/root/reference/data/samples"
    run(image_dir, params)


if __name__ == "__main__":
    main()
