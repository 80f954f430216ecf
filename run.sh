#!/usr/bin/env bash
# Mode dispatcher with the same surface as the reference run.sh:
#   bash run.sh {MODE} {DEVICES}
#   MODE 0=train, 1=NVS eval, 2=mesh, 3=place new mirror,
#        4=reflect new objects, 5=roughness, 52=time-varying roughness,
#        6=reflection substitution
# Scene presets mirror the reference's (run.sh:8-75). DEVICES is accepted for
# CLI parity; device selection on TPU comes from the JAX runtime.

MODE=$1
DEVICES=$2

MODEL_TYPE="nerf"
# MODEL_TYPE="nerf_tcnn"  # hash-grid + SH model (bf16-capable) for speedup

# synthetic scenes
DATASET_NAME=blender

DATASET=livingroom
TRAIN_SKIP_STEP=1
VAL_IDX=0
NEAR=0.05
FAR=8.0
IMAGE_W=400
IMAGE_H=300
BOUND=6

# DATASET=washroom ; FAR=6.0 ; IMAGE_W=400 ; IMAGE_H=400
# DATASET=office   ; FAR=6.0 ; IMAGE_W=400 ; IMAGE_H=400

# real scenes
# DATASET_NAME=real_arkit
# DATASET=discussion_room ; FAR=6.0 ; IMAGE_W=480 ; IMAGE_H=360 ; BOUND=6
# DATASET=market          ; FAR=10.0 ; IMAGE_W=480 ; IMAGE_H=360 ; BOUND=8
# DATASET=lounge          ; FAR=8.0 ; IMAGE_W=480 ; IMAGE_H=360 ; BOUND=6

if [[ $DATASET_NAME == "blender" ]]; then
DATASET_DIR=../datasets/synthetic/${DATASET}
elif [[ $DATASET_NAME == "real_arkit" ]]; then
DATASET_DIR=../datasets/real/${DATASET}
fi

EXP=${DATASET_NAME}_${DATASET}_skip${TRAIN_SKIP_STEP}_res${IMAGE_W}_${MODEL_TYPE}

# # To evaluate a checkpoint:
# LOG=xxx
# CKPT_PATH=logs/$LOG/last.ckpt.npz
# SUBSTITUTION_CKPT_PATH=logs/xxx/last.ckpt.npz
# OBJ_CKPT_PATH=D-NeRF/logs/jumpingjacks/800000.tar

if [[ $MODEL_TYPE == "nerf" ]]; then
SCALE_FACTOR=$BOUND
else
SCALE_FACTOR=1
fi

COMMON_EVAL="--val_idx $VAL_IDX --root_dir $DATASET_DIR --near $NEAR --far $FAR \
 --scale_factor $SCALE_FACTOR --dataset_name $DATASET_NAME \
 --img_wh $IMAGE_W $IMAGE_H --N_importance 64 --ckpt_path $CKPT_PATH \
 --bound $BOUND --model_type $MODEL_TYPE \
 --predict_normal --predict_mirror_mask --trace_secondary_rays --chunk 16384"

if [ "$MODE" = 1 ]; then
SPLIT=test
python eval.py --split $SPLIT --max_recursive_level 2 \
  --exp_name ${SPLIT}_$LOG $COMMON_EVAL

elif [ "$MODE" = 2 ]; then
python extract_color_mesh.py \
  --root_dir $DATASET_DIR --near $NEAR --far $FAR \
  --scale_factor $SCALE_FACTOR --dataset_name $DATASET_NAME --exp_name $LOG \
  --img_wh $IMAGE_W $IMAGE_H --N_importance 64 --ckpt_path $CKPT_PATH \
  --bound $BOUND --model_type $MODEL_TYPE \
  --predict_normal --predict_mirror_mask --trace_secondary_rays \
  --x_range -0.15 0.15 --y_range -0.15 0.15 --z_range -0.15 0.15

elif [ "$MODE" = 3 ]; then
SPLIT=test
PLANE_POS=plane_x
python eval.py --split $SPLIT --max_recursive_level 50 \
  --app_place_new_mirror --plane_pos $PLANE_POS \
  --exp_name app_place_new_mirror_${PLANE_POS}_${SPLIT}_$LOG $COMMON_EVAL

elif [ "$MODE" = 4 ]; then
SPLIT=test_toward_mirror
python eval.py --split $SPLIT \
  --app_reflect_newly_placed_objects --obj_ckpt_path $OBJ_CKPT_PATH \
  --exp_name reflect_newly_placed_objects_${SPLIT}_$LOG $COMMON_EVAL

elif [ "$MODE" = 5 ]; then
trace_ray_times=64
normal_noise_std=0.0025
SPLIT=test_toward_mirror
python eval.py --split $SPLIT \
  --app_control_mirror_roughness --trace_ray_times $trace_ray_times \
  --normal_noise_std $normal_noise_std \
  --exp_name app_control_mirror_roughness_Trace${trace_ray_times}_std${normal_noise_std}_${SPLIT}_$LOG \
  $COMMON_EVAL

elif [ "$MODE" = 52 ]; then
trace_ray_times=64
normal_noise_std=0.01
SPLIT=test_toward_mirror
python eval.py --split $SPLIT \
  --app_control_mirror_roughness --trace_ray_times $trace_ray_times \
  --normal_noise_std $normal_noise_std --normal_noise_std_changes \
  --exp_name app_control_mirror_roughness_Trace${trace_ray_times}_std${normal_noise_std}_change_${SPLIT}_$LOG \
  $COMMON_EVAL

elif [ "$MODE" = 6 ]; then
SPLIT=test_toward_mirror
python eval.py --split $SPLIT \
  --app_reflection_substitution --substitution_ckpt_path $SUBSTITUTION_CKPT_PATH \
  --exp_name reflection_substitution_${SPLIT}_${LOG} $COMMON_EVAL

else
python train.py \
  --dataset_name $DATASET_NAME --root_dir $DATASET_DIR \
  --near $NEAR --far $FAR --scale_factor $SCALE_FACTOR \
  --N_importance 64 --img_wh $IMAGE_W $IMAGE_H --noise_std 1 \
  --num_epochs 30 --batch_size 1024 \
  --optimizer adam --lr 5e-4 \
  --lr_scheduler steplr --decay_step 2 4 8 --decay_gamma 0.5 \
  --exp_name $EXP --bound $BOUND --model_type $MODEL_TYPE \
  --predict_normal --predict_mirror_mask --trace_secondary_rays \
  --train_geometry_stage --use_plane_consistent_loss \
  --val_idx $VAL_IDX --train_skip_step $TRAIN_SKIP_STEP \
  --chunk 8192 --only_trace_rays_in_mirrors
fi

# Usage: bash run.sh {MODE} {DEVICES}   e.g. train: bash run.sh 0 0
