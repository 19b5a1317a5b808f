"""CLI: render predicted hand/object box trajectories onto frames.

Equivalent of demo/visualize_box.py: runs the model on a clip and saves a
grid image with hand boxes (queries 0:2) and object boxes (2:nq) drawn on
each frame.
"""

from __future__ import annotations

import argparse
import os

import numpy as np

from . import common


def draw_boxes(frame_u8: np.ndarray, boxes_xyxy: np.ndarray, color=(0, 255, 0)):
    """Draw pixel-space xyxy boxes on a (H, W, 3) uint8 frame (PIL)."""
    from PIL import Image, ImageDraw

    img = Image.fromarray(frame_u8)
    d = ImageDraw.Draw(img)
    for b in boxes_xyxy:
        if b[2] > b[0] and b[3] > b[1]:
            d.rectangle([float(b[0]), float(b[1]), float(b[2]), float(b[3])], outline=color, width=2)
    return np.asarray(img)


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__)
    common.add_eval_args(p)
    p.add_argument("--clip", required=True, help="video path (mp4 or .npy clip)")
    p.add_argument("--start", type=float, default=0.0)
    p.add_argument("--end", type=float, default=2.0)
    p.add_argument("--out_dir", default="vis")
    p.add_argument(
        "--attn", action="store_true",
        help="also save per-query cross-attention heatmaps (plot_attn_map parity)",
    )
    p.set_defaults(num_frames=4, pred_traj=True)
    args = p.parse_args(argv)
    common.print_env()

    from ..data.video import read_clip_chunked
    from ..ops.boxes import box_cxcywh_to_xyxy
    import jax.numpy as jnp

    model, _, dec_cfg = common.build_eval_model(args)
    frames, _ = read_clip_chunked(args.clip, args.start, args.end, clip_length=args.num_frames)
    _, pred_boxes = model.embed_video(frames[None])
    t = args.num_frames
    res = model.input_res
    boxes = np.asarray(box_cxcywh_to_xyxy(jnp.asarray(pred_boxes))) * res
    boxes = boxes.reshape(t, -1, 4) if boxes.shape[0] == t else np.repeat(boxes, t, axis=0)

    os.makedirs(args.out_dir, exist_ok=True)
    from PIL import Image
    import jax

    vis_frames = np.asarray(
        jax.image.resize(jnp.asarray(frames).astype(np.float32), (t, res, res, 3), "bilinear")
    ).astype(np.uint8)
    rows = []
    for f in range(t):
        hands = draw_boxes(vis_frames[f], boxes[f, :2], color=(255, 0, 0))
        objs = draw_boxes(hands, boxes[f, 2:-1] if boxes.shape[1] > 3 else boxes[f, 2:], color=(0, 255, 0))
        rows.append(objs)
    grid = np.concatenate(rows, axis=1)
    out_path = os.path.join(args.out_dir, "boxes.png")
    Image.fromarray(grid).save(out_path)
    print(f"saved {out_path}")

    if args.attn:
        # last-layer cross-attention of each query over the T x N patch grid
        from ..models.obj_decoder import decoder_forward
        from ..models.lavila import encode_image
        from ..ops.preprocess import resize_normalize

        video = resize_normalize(jnp.asarray(frames[None]), model.input_res)
        _, fmap = encode_image(
            model.backbone_params, model.lavila_cfg, video, use_remat=False
        )
        n = model.lavila_cfg.visual.patches_per_frame
        grid_feats = fmap[:, 1:, :].reshape(1, t, n, -1)
        dout = decoder_forward(
            model.decoder_params, model.dec_cfg, grid_feats, return_attn=True
        )
        attn = np.asarray(dout.cross_attn[-1, 0])  # (Q, T*N)
        side = int(n**0.5)
        maps = attn.reshape(-1, t, side, side)
        maps = maps / (maps.max(axis=(1, 2, 3), keepdims=True) + 1e-8)
        q_rows = []
        for qi in range(maps.shape[0]):
            heat = (maps[qi] * 255).astype(np.uint8)  # (T, side, side)
            q_rows.append(np.concatenate(list(heat), axis=1))
        attn_img = np.concatenate(q_rows, axis=0)
        attn_path = os.path.join(args.out_dir, "cross_attn.png")
        Image.fromarray(attn_img).resize(
            (attn_img.shape[1] * 8, attn_img.shape[0] * 8), Image.NEAREST
        ).save(attn_path)
        print(f"saved {attn_path}")


if __name__ == "__main__":
    main()
