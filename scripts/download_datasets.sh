#!/bin/bash
# Fetch the public benchmark datasets used by the eval scripts.
# Usage: scripts/download_datasets.sh {tum|euroc|7scenes|eth3d|all}
# Parity: reference scripts/download_{tum,euroc,7_scenes,eth3d}.sh
# (same sequence sets, laid out under datasets/ the way the dataloader
# path-sniffing expects).
set -euo pipefail

root="datasets"

fetch() { # url dest_dir
    local url="$1" dest="$2" f
    f="$dest/$(basename "$url")"
    mkdir -p "$dest"
    echo "==> $url"
    wget -c "$url" -O "$f"
    case "$f" in
        *.tgz|*.tar.gz) tar -xzf "$f" -C "$dest" ;;
        *.zip)          unzip -o -q "$f" -d "$dest" ;;
    esac
}

tum() {
    local seqs=(360 floor desk desk2 room plant teddy xyz rpy)
    for s in "${seqs[@]}"; do
        fetch "https://cvg.cit.tum.de/rgbd/dataset/freiburg1/rgbd_dataset_freiburg1_${s}.tgz" \
              "$root/tum"
    done
}

euroc() {
    local seqs=(
        vicon_room1/V1_01_easy vicon_room1/V1_02_medium vicon_room1/V1_03_difficult
        vicon_room2/V2_01_easy vicon_room2/V2_02_medium vicon_room2/V2_03_difficult
        machine_hall/MH_01_easy machine_hall/MH_02_easy machine_hall/MH_03_medium
        machine_hall/MH_04_difficult machine_hall/MH_05_difficult
    )
    for s in "${seqs[@]}"; do
        local name; name="$(basename "$s")"
        fetch "http://robotics.ethz.ch/~asl-datasets/ijrr_euroc_mav_dataset/${s}/${name}.zip" \
              "$root/euroc/${name}"
    done
}

sevenscenes() {
    local base="http://download.microsoft.com/download/2/8/5/28564B23-0828-408F-8631-23B1EFF1DAC8"
    for s in chess fire heads office pumpkin redkitchen stairs; do
        fetch "$base/${s}.zip" "$root/7-scenes"
        unzip -o -q "$root/7-scenes/${s}/seq-01.zip" -d "$root/7-scenes/${s}" || true
    done
}

eth3d() {
    local seqs=(
        cables_1 cables_2 cables_3 camera_shake_1 camera_shake_2 camera_shake_3
        ceiling_1 ceiling_2 desk_3 desk_changing_1 einstein_1 einstein_2
        einstein_dark einstein_flashlight einstein_global_light_changes_1
        einstein_global_light_changes_2 einstein_global_light_changes_3
        kidnap_1 kidnap_dark large_loop_1 mannequin_1 mannequin_3 mannequin_4
        mannequin_5 mannequin_7 mannequin_face_1 mannequin_face_2
        mannequin_face_3 mannequin_head motion_1 planar_2 planar_3 plant_1
        plant_2 plant_3 plant_4 plant_5 plant_dark plant_scene_1 plant_scene_2
        plant_scene_3 reflective_1 repetitive sfm_bench sfm_garden
        sfm_house_loop sfm_lab_room_1 sfm_lab_room_2 sofa_1 sofa_2 sofa_3
        sofa_4 sofa_dark_1 sofa_dark_2 sofa_dark_3 sofa_shake table_3 table_4
        table_7 vicon_light_1 vicon_light_2
    )
    for s in "${seqs[@]}"; do
        fetch "https://www.eth3d.net/data/slam/datasets/${s}_mono.zip" \
              "$root/eth3d/train"
    done
}

case "${1:-all}" in
    tum) tum ;;
    euroc) euroc ;;
    7scenes) sevenscenes ;;
    eth3d) eth3d ;;
    all) tum; euroc; sevenscenes; eth3d ;;
    *) echo "usage: $0 {tum|euroc|7scenes|eth3d|all}" >&2; exit 2 ;;
esac
