"""Data layer: ScanNet-format IO, tuple sampling, GT-match generation, eval pair lists,
synthetic fixtures.

Host-side file IO stays in numpy/cv2-land; everything that runs per training step
(`gt_matches`) is pure jittable tensor math (SURVEY.md section 7.1 item 2).
"""
