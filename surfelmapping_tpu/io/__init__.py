"""Dataset readers (KITTI-layout) and synthetic test scenes."""
