"""Compose a saved camera-frame grasp with base<-camera extrinsics
(equivalent of reference grasp_base.py): offline utility printing the grasp
pose in the robot base frame.
"""

from __future__ import annotations

import argparse

import numpy as np

from graspnet_tpu.utils.transforms import compose_base_grasp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--grasp_path", required=True, help=".npy 4x4 camera-frame grasp")
    p.add_argument(
        "--extrinsics_path", required=True, help=".npy 4x4 base<-camera transform"
    )
    args = p.parse_args()
    grasp = np.load(args.grasp_path).reshape(4, 4)
    base_from_camera = np.load(args.extrinsics_path).reshape(4, 4)
    base_grasp = compose_base_grasp(base_from_camera, grasp)
    np.set_printoptions(suppress=True, precision=5)
    print("grasp in base frame:\n", base_grasp)


if __name__ == "__main__":
    main()
