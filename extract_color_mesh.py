#!/usr/bin/env python
"""Colored mesh extraction (reference-compatible CLI).

Capability parity with reference `extract_color_mesh.py`: dense σ grid over a
user box → iso-surface → largest-cluster denoise → optional vertex colors by
(a) rays along vertex normals through the renderer or (b) multi-view
reprojection with NeRF-opacity occlusion weighting → PLY files under
`results/{dataset}/{exp_name}/mesh/`.
"""

from __future__ import annotations

import argparse
import os

import numpy as np


def get_opt(argv=None):
    from mirror_nerf_tpu.config import add_common_args, config_from_namespace

    parser = argparse.ArgumentParser()
    add_common_args(parser)
    parser.add_argument("--N_grid", type=int, default=256)
    parser.add_argument("--x_range", nargs="+", type=float, default=[-1.0, 1.0])
    parser.add_argument("--y_range", nargs="+", type=float, default=[-1.0, 1.0])
    parser.add_argument("--z_range", nargs="+", type=float, default=[-1.0, 1.0])
    parser.add_argument("--sigma_threshold", type=float, default=20.0)
    parser.add_argument("--occ_threshold", type=float, default=0.2)
    parser.add_argument("--use_vertex_normal", action="store_true",
                        default=False)
    parser.add_argument("--near_t", type=float, default=1.0)
    parser.add_argument("--color_mesh", action="store_true", default=False)
    ns = parser.parse_args(argv)
    return config_from_namespace(ns), ns


def main(argv=None):
    cfg, args = get_opt(argv)

    from mirror_nerf_tpu.utils.cache import enable_compilation_cache

    enable_compilation_cache()
    import jax

    from mirror_nerf_tpu.data import get_dataset
    from mirror_nerf_tpu.eval.mesh import (grid_to_world, largest_cluster,
                                           marching_tetrahedra, query_sigma_grid,
                                           vertex_normals, write_ply)
    from mirror_nerf_tpu.models.fields import make_field
    from mirror_nerf_tpu.train.checkpoints import load_params_any

    split = "test" if cfg.dataset_name == "llff" else "train"
    ds_cls = get_dataset(cfg.dataset_name)
    dataset = ds_cls(cfg.root_dir, split, cfg.img_wh, cfg)

    field = make_field(cfg)
    like = {"coarse": field.init(jax.random.PRNGKey(0))}
    if cfg.N_importance > 0 and not cfg.only_one_field:
        like["fine"] = field.init(jax.random.PRNGKey(1))
    params = load_params_any(cfg.ckpt_path, like, field=field) \
        if cfg.ckpt_path else like
    fine_params = params.get("fine", params["coarse"])

    dir_name = f"results/{cfg.dataset_name}/{cfg.exp_name}/mesh"
    os.makedirs(dir_name, exist_ok=True)
    print(f"[info] Results saved to dir {dir_name}.")

    print("Predicting occupancy ...")
    sigma = query_sigma_grid(field, fine_params, args.N_grid,
                             tuple(args.x_range), tuple(args.y_range),
                             tuple(args.z_range), chunk=cfg.chunk)

    print("Extracting mesh ...")
    verts_grid, tris = marching_tetrahedra(sigma, args.sigma_threshold)
    if len(verts_grid) == 0:
        print(f"[warning] no iso-surface at sigma_threshold="
              f"{args.sigma_threshold} (sigma range "
              f"[{sigma.min():.2f}, {sigma.max():.2f}]); nothing to write.")
        return dir_name
    verts = grid_to_world(verts_grid, args.N_grid, tuple(args.x_range),
                          tuple(args.y_range), tuple(args.z_range))
    write_ply(os.path.join(dir_name, f"{cfg.exp_name}.ply"), verts, tris)

    print("Removing noise ...")
    verts, tris = largest_cluster(verts, tris)
    print(f"Mesh has {len(verts) / 1e6:.2f} M vertices and "
          f"{len(tris) / 1e6:.2f} M faces.")
    write_ply(os.path.join(dir_name, "noise_free.ply"), verts, tris)

    if not args.color_mesh:
        return dir_name

    import jax.numpy as jnp

    from mirror_nerf_tpu.core.rays import make_ray_buffer
    from mirror_nerf_tpu.render.renderer import RenderSettings, render_rays
    from mirror_nerf_tpu.train.loop import render_image_chunked
    from mirror_nerf_tpu.render.tracer import TraceSettings

    W, H = cfg.img_wh
    n_v = len(verts)

    if args.use_vertex_normal:
        # color by rendering rays along vertex normals (reference :247-267)
        normals = vertex_normals(verts, tris)
        bounds_min = getattr(dataset, "near", cfg.near)
        bounds_max = getattr(dataset, "far", cfg.far)
        rays_o = verts - normals * bounds_min * args.near_t
        rays = make_ray_buffer(rays_o.astype(np.float32),
                               normals.astype(np.float32), bounds_min,
                               bounds_max)
        rs = RenderSettings(sigma_activation=cfg.sigma_activation,
                    N_samples=cfg.N_samples,
                            N_importance=cfg.N_importance, perturb=0.0,
                            noise_std=0.0, test_time=True,
                            compute_normal=False, fine_pass="fine"
                            if "fine" in params else "none")
        ts = TraceSettings(render=rs, trace_secondary_rays=False,
                           max_recursive_level=0, is_eval=False)
        res = render_image_chunked(field, params, rays, None,
                                   jax.random.PRNGKey(0), ts, chunk=cfg.chunk,
                                   keys=("rgb_fine", "rgb_coarse"))
        typ = "fine" if "rgb_fine" in res else "coarse"
        v_colors = (np.clip(res[f"rgb_{typ}"], 0, 1) * 255).astype(np.uint8)
    else:
        # multi-view reprojection with occlusion weighting (reference :269-355)
        import cv2
        from PIL import Image

        K = np.array([[dataset.focal, 0, W / 2], [0, dataset.focal, H / 2],
                      [0, 0, 1]], np.float32)
        verts_homo = np.concatenate([verts, np.ones((n_v, 1))], 1)
        non_occluded_sum = np.zeros((n_v, 1))
        v_color_sum = np.zeros((n_v, 3))
        rs = RenderSettings(sigma_activation=cfg.sigma_activation,
                    N_samples=cfg.N_samples, N_importance=0,
                            perturb=0.0, noise_std=0.0, test_time=False,
                            compute_normal=False, fine_pass="none")
        ts = TraceSettings(render=rs, trace_secondary_rays=False,
                           max_recursive_level=0, is_eval=False)
        fine_only = {"coarse": fine_params}

        poses = dataset.poses
        image_paths = getattr(dataset, "image_paths", None)
        n_views = len(poses)
        for idx in range(n_views):
            if image_paths is not None:
                image = Image.open(image_paths[idx]).convert("RGB")
                image = np.array(image.resize((W, H), Image.LANCZOS))
            else:
                image = (dataset.get_image(idx)["rgbs"].reshape(H, W, 3)
                         * 255).astype(np.uint8)
            pose = np.asarray(poses[idx])[:3, :4] if poses[idx].shape[0] > 3 \
                else np.asarray(poses[idx])
            P_c2w = np.concatenate([pose, [[0, 0, 0, 1]]], 0)
            P_w2c = np.linalg.inv(P_c2w)[:3]
            vc = P_w2c @ verts_homo.T
            vc[1:] *= -1  # "right up back" -> "right down forward"
            vi = (K @ vc).T
            depth = vi[:, -1:] + 1e-5
            vi = (vi[:, :2] / depth).astype(np.float32)
            vi[:, 0] = np.clip(vi[:, 0], 0, W - 1)
            vi[:, 1] = np.clip(vi[:, 1], 0, H - 1)
            colors = []
            for i in range(0, n_v, 30000):
                colors.append(cv2.remap(image, vi[i:i + 30000, 0],
                                        vi[i:i + 30000, 1],
                                        interpolation=cv2.INTER_LINEAR)[:, 0])
            colors = np.vstack(colors)

            rays_o = np.broadcast_to(pose[:, 3], (n_v, 3)).astype(np.float32)
            rays_d = verts - rays_o
            rays_d = rays_d / np.linalg.norm(rays_d, axis=-1, keepdims=True)
            rays = np.concatenate(
                [rays_o, rays_d.astype(np.float32),
                 np.full((n_v, 1), cfg.near, np.float32),
                 depth.astype(np.float32)], 1)
            res = render_image_chunked(field, fine_only, rays, None,
                                       jax.random.PRNGKey(idx), ts,
                                       chunk=cfg.chunk,
                                       keys=("opacity_coarse",))
            opacity = np.nan_to_num(res["opacity_coarse"], nan=1.0)[:, None]
            non_occluded = np.ones_like(non_occluded_sum) * 0.1 / depth
            non_occluded += opacity < args.occ_threshold
            v_color_sum += colors * non_occluded
            non_occluded_sum += non_occluded
            print(f"fused view {idx + 1}/{n_views}")
        v_colors = (v_color_sum / non_occluded_sum).astype(np.uint8)

    write_ply(os.path.join(dir_name, f"{cfg.exp_name}_colored.ply"), verts,
              tris, v_colors)
    print("Done!")
    return dir_name


if __name__ == "__main__":
    main()
