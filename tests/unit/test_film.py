

def test_ppm_and_bmp_output(tmp_path):
    """Round-4: reference-class writers (PPM/BMP) alongside PNG."""
    import numpy as np

    from tputracer.film import save_image, to_srgb

    img = np.random.default_rng(0).uniform(0, 1.2, (8, 6, 3)).astype("f4")
    p = save_image(img, str(tmp_path / "o.ppm"))
    raw = open(p, "rb").read()
    assert raw.startswith(b"P6\n6 8\n255\n")
    body = raw.split(b"255\n", 1)[1]
    assert np.frombuffer(body, np.uint8).reshape(8, 6, 3).shape == (8, 6, 3)
    np.testing.assert_array_equal(
        np.frombuffer(body, np.uint8).reshape(8, 6, 3), to_srgb(img))

    b = save_image(img, str(tmp_path / "o.bmp"))
    from PIL import Image

    back = np.asarray(Image.open(b))
    np.testing.assert_array_equal(back, to_srgb(img))
