"""Analysis layer: loss landscape, depth-bias fits, sensors, results tables."""
import numpy as np
import jax.numpy as jnp


def test_loss_landscape_minimum_at_gt(tmp_path):
    """The landscape's sanity property: minimum at the injected GT weight
    (reference: loss_landscape.py:148-209)."""
    from depth_correction_tpu.config import Config
    from depth_correction_tpu.loss_landscape import loss_landscape

    gt_w = -0.002
    cfg = Config()
    cfg.float_type = "float64"
    cfg.train_names = ["ground_plane/5"]
    cfg.min_depth, cfg.max_depth, cfg.grid_res = 0.1, 20.0, 0.25
    cfg.nn_r, cfg.nn_k = 0.4, 0
    cfg.vp_dispersion_bounds = []
    cfg.eigenvalue_ratio_bounds = []
    cfg.min_valid_neighbors = 3
    cfg.model_kwargs = {"w": [0.0], "exponent": [4.0]}
    cfg.depth_bias_model_kwargs = {"w": [gt_w], "exponent": [4.0]}
    cfg.loss_kwargs = {"sqrt": False, "normalization": False}

    w, losses = loss_landscape(cfg, weights=np.linspace(-0.004, 0.0, 9))
    best = w[np.argmin(losses)]
    assert abs(best - gt_w) <= 5e-4, (best, losses)


def test_depth_bias_fit_recovers_slope():
    from depth_correction_tpu.cloud import Cloud
    from depth_correction_tpu.depth_bias import fit_depth_bias, plane_distances

    rng = np.random.default_rng(0)
    n = 400
    inc = rng.uniform(0.1, 1.2, n)
    pts = rng.uniform(1, 10, (n, 3))
    cloud = Cloud.from_points(pts)
    # Construct a synthetic linear bias: dist = 0.01 * inc along the normal.
    normals = np.tile([0.0, 0.0, 1.0], (n, 1))
    mean = pts - normals * (0.01 * inc)[:, None]
    cloud = cloud.replace(
        normals=jnp.asarray(normals),
        mean=jnp.asarray(mean),
        inc_angles=jnp.asarray(inc),
    )
    d = np.asarray(plane_distances(cloud))
    np.testing.assert_allclose(d, 0.01 * inc, atol=1e-9)
    fits = fit_depth_bias(cloud)
    coef = fits["dist_vs_angle_deg1"]
    np.testing.assert_allclose(coef[1], 0.01, atol=1e-6)


def test_sensor_beam_model():
    from depth_correction_tpu.sensor import Sensors

    s = Sensors.hokuyo_utm_30lx
    # Beam radius grows monotonically and equals sqrt(2)*w0 at z_R.
    zr = s.rayleigh_length
    np.testing.assert_allclose(
        float(s.beam_radius(zr)), np.sqrt(2) * s.beam_exit_radius, rtol=1e-6
    )
    r = np.asarray(s.beam_radius(np.linspace(0, 30, 10)))
    assert np.all(np.diff(r) > 0)


def test_results_tables(tmp_path):
    from depth_correction_tpu.results import (
        format_table,
        mean_loss_table,
        read_slam_eval_csv,
        to_latex,
    )

    exp = tmp_path / "expA" / "split_0"
    exp.mkdir(parents=True)
    (exp / "loss_eval_min_eigval_loss_test.csv").write_text(
        "seq1 0.001\nseq2 0.003\n"
    )
    (exp / "slam_eval_norlab_icp_mapper_test.csv").write_text(
        "seq1 0.01 0.2 0.001 0.02\n"
    )
    header, rows = mean_loss_table(str(tmp_path), "min_eigval_loss")
    assert len(rows) == 1
    np.testing.assert_allclose(rows[0][2], 0.002)
    text = format_table(header, rows)
    assert "mean_min_eigval_loss" in text and "0.002" in text
    latex = to_latex(header, rows)
    assert latex.startswith(r"\begin{tabular}")
    slam = read_slam_eval_csv(str(exp / "slam_eval_norlab_icp_mapper_test.csv"))
    assert slam[0][2] == 0.2


def test_results_slam_tables_and_plots(tmp_path):
    """Per-config and per-sequence SLAM tables plus trajectory plots render
    from gen/-style CSVs in one call (reference: results.py:158-186,
    498-598)."""
    import os

    from depth_correction_tpu.datasets.asl_laser import write_poses
    from depth_correction_tpu.results import (
        mean_slam_table,
        plot_slam_trajs,
        render_all,
        slam_error_per_sequence,
    )

    for split, rows in (("split_0", ["seqA 0.010 0.20 0.001 0.02",
                                     "seqB 0.020 0.40 0.002 0.04"]),
                        ("split_1", ["seqA 0.030 0.60 0.003 0.06"])):
        exp = tmp_path / "expA" / split
        exp.mkdir(parents=True)
        (exp / "slam_eval_icp_mapper_test.csv").write_text("\n".join(rows) + "\n")
        (exp / "loss_eval_min_eigval_loss_test.csv").write_text("seqA 0.001\n")

    header, rows = mean_slam_table(str(tmp_path), "icp_mapper")
    assert len(rows) == 2  # one per split config
    r0 = rows[0]
    np.testing.assert_allclose(r0[3], np.degrees(0.015))  # mean r in degrees
    np.testing.assert_allclose(r0[5], 0.3)

    header, rows = slam_error_per_sequence(str(tmp_path), "icp_mapper")
    seqs = {r[0]: r for r in rows}
    np.testing.assert_allclose(seqs["seqA"][2], 0.4)  # mean of 0.2, 0.6
    np.testing.assert_allclose(seqs["seqB"][2], 0.4)
    assert seqs["seqA"][3] == 2

    # Trajectory CSV -> figure via render_all.
    poses = np.tile(np.eye(4), (5, 1, 1))
    poses[:, 0, 3] = np.arange(5.0)
    write_poses(range(5), poses, str(tmp_path / "expA" / "slam_poses_icp_mapper.csv"))
    artifacts = render_all(str(tmp_path))
    assert any(v.endswith(".png") and os.path.exists(v) for v in artifacts.values())
    assert os.path.exists(artifacts["mean_slam_error"])
    assert os.path.exists(artifacts["slam_error_per_sequence"])

    fig = plot_slam_trajs({"GT": poses, "SLAM": poses + 0.01},
                          str(tmp_path / "traj.png"))
    assert os.path.exists(fig)


def test_visualization_helpers():
    from depth_correction_tpu.visualization import map_colors

    colors = map_colors(np.linspace(0, 1, 5), colormap=np.array([[0, 0, 0], [1, 1, 1]]))
    np.testing.assert_allclose(colors[0], [0, 0, 0])
    np.testing.assert_allclose(colors[-1], [1, 1, 1])
    assert colors.shape == (5, 3)
