"""Device-side ops: stitching, upsampling, on-device augmentation."""
