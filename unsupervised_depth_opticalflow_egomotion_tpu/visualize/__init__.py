from .visualizer import Visualizer, save_disp_color_img

__all__ = ["Visualizer", "save_disp_color_img"]
