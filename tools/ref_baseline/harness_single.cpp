// Baseline-measurement harness for the C++ reference's SINGLE-UAV solver.
//
// Drives Optimization3D_admm::optimization (read-only headers from
// /root/reference via -I) on the exported bridge-class scene, reproducing the
// admmPathPlanning3D main's setup (Main/admmPathPlanning3D.cpp:355-547:
// Config File/3D.json values, the single main's ks=1e-8/kt=1, waypoint init
// file, init_variable spline layout) without its libigl/OMPL dependencies.
//
// Usage: ./ref_harness_single <mesh-name> [max_iters]
//   from a cwd containing model/single/<mesh>.obj and
//   init/<mesh>_init_file.txt (written by export_scene.py --single).

#include "HighOrderCCD/Utils/CCDUtils.h"
#include "HighOrderCCD/Optimization/Optimization3D_admm.h"
#include "HighOrderCCD/BVH/BVH.h"

#include <chrono>
#include <fstream>
#include <iostream>
#include <sstream>
#include <string>
#include <vector>

USE_PRJ_NAMESPACE

typedef Eigen::MatrixXd Data;

static void read_waypoints(const std::string &mesh,
                           std::vector<Eigen::Vector3d> &wps) {
  // single-column reader (Main/admmPathPlanning3D.cpp:79-112)
  std::ifstream f("init/" + mesh + "_init_file.txt");
  if (!f.is_open()) {
    std::cerr << "missing init file for " << mesh << "\n";
    exit(1);
  }
  std::string line;
  while (std::getline(f, line)) {
    std::istringstream iss(line);
    Eigen::Vector3d p;
    if (iss >> p(0) >> p(1) >> p(2)) wps.push_back(p);
  }
}

static void init_variable(const std::vector<Eigen::Vector3d> &wps, Data &spline,
                          double &piece_time, Data &p_slack,
                          Eigen::VectorXd &t_slack, Data &p_lambda,
                          Eigen::VectorXd &t_lambda) {
  // spline layout of the single main (Main/admmPathPlanning3D.cpp:255-275)
  piece_time = 20;
  spline.resize(trajectory_num, 3);
  spline.row(0) = wps[0].transpose();
  for (int i = 0; i < piece_num; i++) {
    Eigen::Vector3d head = 0.9 * wps[i] + 0.1 * wps[i + 1];
    Eigen::Vector3d tail = 0.9 * wps[i + 1] + 0.1 * wps[i];
    spline.row(i * (order_num - 2) + 1) = wps[i].transpose();
    for (int j = 1; j < order_num - 2; j++)
      spline.row(j + i * (order_num - 2) + 1) =
          double(order_num - 3 - j) / (order_num - 4) * head.transpose() +
          double(j - 1) / (order_num - 4) * tail.transpose();
    spline.row((i + 1) * (order_num - 2) + 1) = wps[i + 1].transpose();
  }
  spline.row(trajectory_num - 1) = wps[piece_num].transpose();
  spline.row(1) = spline.row(0);
  spline.row(trajectory_num - 2) = spline.row(trajectory_num - 1);

  p_lambda = Data::Zero((order_num + 1) * piece_num, 3);
  p_slack.resize((order_num + 1) * piece_num, 3);
  for (int sp = 0; sp < piece_num; sp++)
    p_slack.block<order_num + 1, 3>(sp * (order_num + 1), 0) =
        convert_list[sp] *
        spline.block<order_num + 1, 3>(sp * (order_num - 2), 0);
  t_slack = Eigen::VectorXd::Constant(piece_num, piece_time);
  t_lambda = Eigen::VectorXd::Zero(piece_num);

  M_dynamic = Dynamic3D<order_num, der_num>::dynamic_matrix();
  subdivide_tree.resize(piece_num * res);
  A_list.resize(piece_num * res);
  A_vel_list.resize(piece_num * res);
  A_acc_list.resize(piece_num * res);
  Eigen::Matrix3d I = Eigen::Matrix3d::Identity();
  Eigen::MatrixXd basis;
  for (int k = 0; k < res; k++) {
    double a = k / double(res), b = (k + 1) / double(res);
    Blossom<order_num>::coefficient(basis, a, b);
    for (int i = 0; i < piece_num; i++) {
      std::pair<double, double> range(a, b);
      Eigen::MatrixXd tmp = basis * convert_list[i];
      subdivide_tree[i * res + k] = std::make_tuple(i, range, tmp);
      A_list[i * res + k].resize(order_num + 1);
      A_vel_list[i * res + k].resize(order_num);
      A_acc_list[i * res + k].resize(order_num - 1);
      for (int j = 0; j <= order_num; j++) {
        Eigen::MatrixXd A = Eigen::kroneckerProduct(tmp.row(j), I);
        A.transposeInPlace();
        A_list[i * res + k][j] = A;
        if (j < order_num)
          A_vel_list[i * res + k][j] =
              Eigen::kroneckerProduct(tmp.row(j + 1), I) -
              Eigen::kroneckerProduct(tmp.row(j), I);
        if (j < order_num - 1)
          A_acc_list[i * res + k][j] =
              Eigen::kroneckerProduct(tmp.row(j + 2), I) -
              2 * Eigen::kroneckerProduct(tmp.row(j + 1), I) +
              Eigen::kroneckerProduct(tmp.row(j), I);
      }
    }
  }
}

int main(int argc, char **argv) {
  if (argc < 2) {
    std::cerr << "usage: " << argv[0] << " <mesh> [max_iters]\n";
    return 1;
  }
  const std::string mesh = argv[1];
  const int max_iters = argc > 2 ? std::atoi(argv[2]) : 500;

  // Config File/3D.json defaults + the single main's ks/kt
  // (Main/admmPathPlanning3D.cpp:477-478)
  lambda = 10.0;
  epsilon = 0.1;
  margin = 0.1;
  offset = 0.1;
  res = 8;
  mu = 0.1;
  vel_limit = 2.0;
  acc_limit = 2.0;
  ks = 1e-8;
  kt = 1.0;
  is_optimal_plane = false;
  automove = true;
  const double stop = 1e-2;

  int dim = kdop_axis.size();
  kdop_matrix.resize(3, dim);
  for (int k = 0; k < dim; k++) {
    kdop_axis[k].normalize();
    kdop_matrix.col(k) = kdop_axis[k];
  }
  aabb_matrix.resize(3, 3);
  for (int k = 0; k < 3; k++) aabb_matrix.col(k) = aabb_axis[k];

  Eigen::MatrixXd V;
  Mesh::readOBJ("model/single/" + mesh + ".obj", V);  // no x5 (single main)
  BVH bvh;
  bvh.InitPointcloud(V);
  std::vector<Eigen::RowVector3d> vertex_list(V.rows());
  for (int i = 0; i < (int)vertex_list.size(); i++) vertex_list[i] = V.row(i);

  result_file.open("result/" + mesh + "_single_harness.txt");

  std::vector<Eigen::Vector3d> wps;
  read_waypoints(mesh, wps);
  uav_num = 1;
  piece_num = (int)wps.size() - 1;
  time_weight.assign(piece_num, 1.0);
  whole_weight = piece_num;
  trajectory_num = (order_num + 1) + (piece_num - 1) * (order_num + 1 - 3);
  combination = Combination<40>::value();
  Conversion<order_num>::convert_matrix();

  Data spline, p_slack, p_lambda;
  Eigen::VectorXd t_slack, t_lambda;
  double piece_time;
  init_variable(wps, spline, piece_time, p_slack, t_slack, p_lambda, t_lambda);

  std::cout << "pieces=" << piece_num << " cloud=" << V.rows() << "\n";

  gnorm = 1;
  iter = 0;
  auto t0 = std::chrono::steady_clock::now();
  while (iter < max_iters && !(iter > 1 && gnorm < stop)) {
    Optimization3D_admm::optimization(spline, piece_time, p_slack, t_slack,
                                      p_lambda, t_lambda, vertex_list, bvh);
    iter++;
  }
  auto t1 = std::chrono::steady_clock::now();
  double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();

  // log_data trajectory-quality protocol (Main/admmPathPlanning3D.cpp:33-77)
  double len_total = 0, min_clear = 1e30;
  {
    Eigen::Vector3d prev;
    bool haveprev = false;
    for (int sp = 0; sp < piece_num; sp++) {
      Data bz = convert_list[sp] *
                spline.block<order_num + 1, 3>(sp * (order_num - 2), 0);
      for (double t = 0.0; t < 1.0; t += 0.05 / piece_time) {
        Eigen::Vector3d pos = Eigen::Vector3d::Zero();
        for (int j = 0; j <= order_num; j++)
          pos += combination[order_num][j] * std::pow(t, j) *
                 std::pow(1 - t, order_num - j) * bz.row(j).transpose();
        if (haveprev) len_total += (pos - prev).norm();
        prev = pos;
        haveprev = true;
        for (int q = 0; q < (int)vertex_list.size(); q++) {
          double d = (vertex_list[q].transpose() - pos).norm();
          if (d < min_clear) min_clear = d;
        }
      }
    }
  }

  std::cout << "RESULT mesh=" << mesh << " mode=single iters=" << iter
            << " wall_ms=" << ms << " iters_per_s=" << iter / (ms / 1e3)
            << " gnorm=" << gnorm << " piece_time=" << piece_time
            << " ccd_time=" << whole_weight * piece_time
            << " ccd_len=" << len_total << " min_clearance=" << min_clear
            << "\n";
  return iter < max_iters ? 0 : 2;
}
