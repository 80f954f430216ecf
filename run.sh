#!/usr/bin/env bash
# Mode dispatcher with the reference-compatible surface:
#   bash run.sh {MODE} {DEVICES}
# MODE: 0 train | 1 NVS eval | 2 mesh | 3 place new mirror |
#       4 reflect new objects | 5 roughness | 52 time-varying roughness |
#       6 reflection substitution
# DEVICES is accepted for CLI parity; on TPU device selection comes from the
# JAX runtime. Edit SCENE below (or export SCENE=...) to pick a preset.
set -u
MODE=${1:-0}
DEVICES=${2:-0}

SCENE=${SCENE:-livingroom}
# nerf | nerf_tcnn (hash grid) | nerf_tpu (CP-grid TPU speed path)
MODEL_TYPE=${MODEL_TYPE:-nerf}

# scene presets: name -> "dataset_name dir near far img_w img_h bound"
declare -A PRESETS=(
  [livingroom]="blender ../datasets/synthetic/livingroom 0.05 8.0 400 300 6"
  [washroom]="blender ../datasets/synthetic/washroom 0.05 6.0 400 400 6"
  [office]="blender ../datasets/synthetic/office 0.05 6.0 400 400 6"
  [discussion_room]="real_arkit ../datasets/real/discussion_room 0.05 6.0 480 360 6"
  [market]="real_arkit ../datasets/real/market 0.05 10.0 480 360 8"
  [lounge]="real_arkit ../datasets/real/lounge 0.05 8.0 480 360 6"
  [mirror_room_demo]="blender ./scene 0.05 12.0 96 96 6"  # procedural demo
)
read -r DATASET_NAME DATA_DIR NEAR FAR IMG_W IMG_H BOUND <<< "${PRESETS[$SCENE]}"

if [ "$MODEL_TYPE" = nerf ]; then SCALE=$BOUND; else SCALE=1; fi
EXP=${DATASET_NAME}_${SCENE}_res${IMG_W}_${MODEL_TYPE}
CKPT=${CKPT:-logs/${LOG:-latest}/last.ckpt.npz}

MODEL_FLAGS=(--model_type "$MODEL_TYPE" --predict_normal --predict_mirror_mask
             --trace_secondary_rays --bound "$BOUND")
DATA_FLAGS=(--dataset_name "$DATASET_NAME" --root_dir "$DATA_DIR"
            --near "$NEAR" --far "$FAR" --scale_factor "$SCALE"
            --img_wh "$IMG_W" "$IMG_H")
EVAL_FLAGS=("${DATA_FLAGS[@]}" "${MODEL_FLAGS[@]}" --N_importance 64
            --ckpt_path "$CKPT" --chunk 16384 --val_idx "${VAL_IDX:-0}")
# production eval path for the CP-grid model: fused Pallas kernels, and
# (opt-in, quality-gate per checkpoint — BASELINE.md round 4) the
# proposal-skip schedule: PROPOSAL_SKIP=1 bash run.sh 1
if [ "$MODEL_TYPE" = nerf_tpu ]; then
  EVAL_FLAGS+=(--fused_field)
  [ -n "${PROPOSAL_SKIP:-}" ] && EVAL_FLAGS+=(--proposal_skip)
fi

case "$MODE" in
  1)  python eval.py "${EVAL_FLAGS[@]}" --split "${SPLIT:-test}" \
        --max_recursive_level 2 --exp_name "eval_${EXP}" ;;
  2)  python extract_color_mesh.py "${DATA_FLAGS[@]}" "${MODEL_FLAGS[@]}" \
        --N_importance 64 --ckpt_path "$CKPT" --exp_name "$EXP" \
        --x_range -0.15 0.15 --y_range -0.15 0.15 --z_range -0.15 0.15 ;;
  3)  python eval.py "${EVAL_FLAGS[@]}" --split "${SPLIT:-test}" \
        --max_recursive_level 50 --app_place_new_mirror \
        --plane_pos "${PLANE_POS:-plane_x}" \
        --exp_name "app_new_mirror_${EXP}" ;;
  4)  python eval.py "${EVAL_FLAGS[@]}" --split "${SPLIT:-test_toward_mirror}" \
        --app_reflect_newly_placed_objects \
        --obj_ckpt_path "${OBJ_CKPT:?set OBJ_CKPT=path/to/dnerf.tar}" \
        --exp_name "app_objects_${EXP}" ;;
  5)  python eval.py "${EVAL_FLAGS[@]}" --split "${SPLIT:-test_toward_mirror}" \
        --app_control_mirror_roughness --trace_ray_times 64 \
        --normal_noise_std 0.0025 --exp_name "app_roughness_${EXP}" ;;
  52) python eval.py "${EVAL_FLAGS[@]}" --split "${SPLIT:-test_toward_mirror}" \
        --app_control_mirror_roughness --trace_ray_times 64 \
        --normal_noise_std 0.01 --normal_noise_std_changes \
        --exp_name "app_roughness_tv_${EXP}" ;;
  6)  python eval.py "${EVAL_FLAGS[@]}" --split "${SPLIT:-test_toward_mirror}" \
        --app_reflection_substitution \
        --substitution_ckpt_path "${SUB_CKPT:?set SUB_CKPT=path/to/ckpt}" \
        --exp_name "app_substitution_${EXP}" ;;
  *)  # decay schedule is model-dependent (measured, STATUS.md): the
      # reference schedule {2,4,8} fixes the flagship's late-training
      # collapse but destabilizes the CP-grid speed model, which wants a
      # slower schedule. nerf_tpu also takes the round-3 sweep winner:
      # grid tables at 20x lr with adam_eps 1e-15 (+5.5 dB held-out;
      # 40x diverges — sweeps/results.jsonl).
      EPOCHS=30
      if [ "$MODEL_TYPE" = nerf_tpu ]; then
        DECAY="8 14 18"; EPOCHS=20  # measured as a pair (ep20 sweep arm)
        MODEL_FLAGS+=(--grid_lr_mult 20 --adam_eps 1e-15)
      else
        DECAY="2 4 8"
      fi
      python train.py "${DATA_FLAGS[@]}" "${MODEL_FLAGS[@]}" \
        --N_importance 64 --noise_std 1 --num_epochs "$EPOCHS" --batch_size 1024 \
        --optimizer adam --lr 5e-4 --lr_scheduler steplr \
        --decay_step ${DECAY:-2 4 8} --decay_gamma 0.5 --chunk 8192 \
        --train_geometry_stage --use_plane_consistent_loss \
        --only_trace_rays_in_mirrors --train_skip_step 1 \
        --novel_ray_batch 512 --novel_pose_jitter 0.2 \
        --novel_ray_loss_weight 3e-3 --novel_ray_start_epoch 4 \
        --val_idx "${VAL_IDX:-0}" --exp_name "$EXP" ;;
esac
