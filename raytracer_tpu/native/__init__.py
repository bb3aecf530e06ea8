"""Native C++ runtime components (BVH build, OBJ parse, PNG encode),
exposed via ctypes with pure-Python fallbacks."""
