from tputracer.scene.types import (  # noqa: F401
    DIFFUSE,
    GLASS,
    MIRROR,
    Camera,
    Scene,
    make_camera,
    make_scene,
)
from tputracer.scene.cornell import cornell_box, furnace  # noqa: F401
from tputracer.scene.mesh import (  # noqa: F401
    load_obj,
    mesh_scene,
    obj_scene,
)
