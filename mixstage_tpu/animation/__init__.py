from mixstage_tpu.animation.animation import (animate, render_ground_truth,  # noqa: F401
                                              save_animation)
