from .flash_array import (FlashArray, flash_empty, flash_free, map_array,
                          mem_array)

__all__ = ["FlashArray", "flash_empty", "flash_free", "map_array", "mem_array"]
