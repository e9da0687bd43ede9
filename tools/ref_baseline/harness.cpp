// Baseline-measurement harness for the C++ reference solver.
//
// Drives the reference's multi-robot ADMM optimizer (headers included
// read-only from /root/reference via -I) on the exact scene bench.py solves,
// reproducing the multiPathPlanning3D main's setup
// (Main/multiPathPlanning3D.cpp:469-700: config values of Config File/3D.json,
// V*=5 scaling, waypoint init file, init_variable) WITHOUT its libigl/OMPL
// dependencies, so a measured baseline can be recorded in BASELINE.md.
//
// Build (see run.sh):
//   g++ -O3 -fopenmp -std=c++14 harness.cpp \
//       $REF/HighOrderCCD/Utils/CCDUtils.cpp $REF/HighOrderCCD/BVH/BVH.cpp \
//       $REF/HighOrderCCD/BVH/src/AABB.cc $REF/lib/opengjk/src/openGJK.c \
//       -I$REF -I$REF/lib/eigen3 -I$REF/lib/opengjk/include -o ref_harness
//
// Usage: ./ref_harness <mesh-name> <decouple 0|1> [max_iters]
//   from a cwd containing model/multiple/<mesh>.obj and
//   init/<mesh>_init_file.txt (written by export_scene.py).

#include "HighOrderCCD/Utils/CCDUtils.h"
#include "HighOrderCCD/Optimization/Optimization3D_multi.h"
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
                           std::vector<std::vector<Eigen::Vector3d>> &wps) {
  // reader semantics of Main/multiPathPlanning3D.cpp:78-115 (x5 scaling incl.)
  std::ifstream f("init/" + mesh + "_init_file.txt");
  if (!f.is_open()) {
    std::cerr << "missing init file for " << mesh << "\n";
    exit(1);
  }
  std::string line;
  bool first = true;
  while (std::getline(f, line)) {
    std::istringstream iss(line);
    std::vector<double> vals;
    double v;
    while (iss >> v) vals.push_back(v);
    if (vals.empty()) continue;
    if (first) {
      uav_num = (int)vals.size() / 3;
      wps.resize(uav_num);
      first = false;
    }
    for (int j = 0; j < uav_num; j++)
      wps[j].push_back(5.0 * Eigen::Vector3d(vals[3 * j], vals[3 * j + 1],
                                             vals[3 * j + 2]));
  }
}

static void init_variable(
    const std::vector<std::vector<Eigen::Vector3d>> &wps,
    std::vector<Data> &spline_list, double &piece_time,
    std::vector<Data> &p_slack_list, std::vector<Eigen::VectorXd> &t_slack_list,
    std::vector<Data> &p_lambda_list,
    std::vector<Eigen::VectorXd> &t_lambda_list) {
  // state layout + operator tables per Main/multiPathPlanning3D.cpp:342-467
  spline_list.resize(uav_num);
  p_slack_list.resize(uav_num);
  t_slack_list.resize(uav_num);
  p_lambda_list.resize(uav_num);
  t_lambda_list.resize(uav_num);
  piece_time = 20;
  for (int i = 0; i < uav_num; i++) {
    Data spline(trajectory_num, 3);
    spline.row(0) = wps[i][0].transpose();
    for (int k = 0; k < piece_num; k++)
      for (int j = 0; j <= order_num - 2; j++)
        spline.row(j + k * (order_num - 2) + 1) =
            double(order_num - 2 - j) / (order_num - 2) * wps[i][k].transpose() +
            double(j) / (order_num - 2) * wps[i][k + 1].transpose();
    spline.row(trajectory_num - 1) = wps[i][piece_num].transpose();
    spline.row(1) = spline.row(0);
    spline.row(trajectory_num - 2) = spline.row(trajectory_num - 1);

    Data p_slack((order_num + 1) * piece_num, 3);
    Data p_lambda = Data::Zero((order_num + 1) * piece_num, 3);
    for (int sp = 0; sp < piece_num; sp++)
      p_slack.block<order_num + 1, 3>(sp * (order_num + 1), 0) =
          convert_list[sp] *
          spline.block<order_num + 1, 3>(sp * (order_num - 2), 0);
    Eigen::VectorXd t_slack =
        Eigen::VectorXd::Constant(piece_num, piece_time);
    Eigen::VectorXd t_lambda = Eigen::VectorXd::Zero(piece_num);

    spline_list[i] = spline;
    p_slack_list[i] = p_slack;
    t_slack_list[i] = t_slack;
    p_lambda_list[i] = p_lambda;
    t_lambda_list[i] = t_lambda;
  }

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

  is_self_seperate.resize(piece_num * res);
  self_seperate_c.resize(piece_num * res);
  self_seperate_d.resize(piece_num * res);
  for (int i = 0; i < piece_num * res; i++) {
    is_self_seperate[i].resize(uav_num);
    self_seperate_c[i].resize(uav_num);
    self_seperate_d[i].resize(uav_num);
    for (int j = 0; j < uav_num; j++) {
      is_self_seperate[i][j].assign(uav_num, false);
      self_seperate_c[i][j].resize(uav_num);
      self_seperate_d[i][j].resize(uav_num);
    }
  }
}

int main(int argc, char **argv) {
  if (argc < 3) {
    std::cerr << "usage: " << argv[0] << " <mesh> <decouple 0|1> [max_iters]\n";
    return 1;
  }
  const std::string mesh = argv[1];
  const int decouple = std::atoi(argv[2]);
  const int max_iters = argc > 3 ? std::atoi(argv[3]) : 500;

  // Config File/3D.json defaults + the multi main's hardcoded ks/kt
  lambda = 10.0;
  epsilon = 0.1;
  margin = 0.1;
  offset = 0.1;
  res = 8;
  mu = 0.1;
  vel_limit = 2.0;
  acc_limit = 2.0;
  ks = 1e-3;
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
  Mesh::readOBJ("model/multiple/" + mesh + ".obj", V);
  V *= 5;
  BVH bvh;
  bvh.InitPointcloud(V);
  std::vector<Eigen::RowVector3d> vertex_list(V.rows());
  for (int i = 0; i < (int)vertex_list.size(); i++) vertex_list[i] = V.row(i);

  result_file.open("result/" + mesh + "_harness.txt");

  std::vector<std::vector<Eigen::Vector3d>> wps;
  read_waypoints(mesh, wps);
  piece_num = (int)wps[0].size() - 1;
  time_weight.assign(piece_num, 1.0);
  whole_weight = piece_num;
  trajectory_num = (order_num + 1) + (piece_num - 1) * (order_num + 1 - 3);
  combination = Combination<40>::value();
  Conversion<order_num>::convert_matrix();

  std::vector<Data> spline_list, p_slack_list, p_lambda_list;
  std::vector<Eigen::VectorXd> t_slack_list, t_lambda_list;
  double piece_time;
  init_variable(wps, spline_list, piece_time, p_slack_list, t_slack_list,
                p_lambda_list, t_lambda_list);
  std::vector<double> piece_time_list(uav_num, piece_time);

  std::cout << "uavs=" << uav_num << " pieces=" << piece_num
            << " cloud=" << V.rows() << " decouple=" << decouple << "\n";

  gnorm = 1;
  iter = 0;
  auto t0 = std::chrono::steady_clock::now();
  while (iter < max_iters && !(iter > 1 && gnorm < stop)) {
    if (decouple)
      Optimization3D_multi::optimization_decouple(
          spline_list, piece_time_list, p_slack_list, t_slack_list,
          p_lambda_list, t_lambda_list, vertex_list, bvh);
    else
      Optimization3D_multi::optimization(spline_list, piece_time, p_slack_list,
                                         t_slack_list, p_lambda_list,
                                         t_lambda_list, vertex_list, bvh);
    iter++;
  }
  auto t1 = std::chrono::steady_clock::now();
  double ms = std::chrono::duration<double, std::milli>(t1 - t0).count();

  // trajectory quality per the reference's log_data protocol
  // (Main/admmPathPlanning3D.cpp:33-77): ccd time = sum time_weight*piece_time,
  // ccd len = arc length of the densely resampled curve; plus min clearance
  // of the sampled curve to the cloud (the parity feasibility check).
  double len_total = 0, time_total = 0, min_clear = 1e30, min_pair = 1e30;
  std::vector<std::vector<Eigen::Vector3d>> samples(uav_num);
  for (int i = 0; i < uav_num; i++) {
    double pt = decouple ? piece_time_list[i] : piece_time;
    time_total += whole_weight * pt;
    const Data &spline = spline_list[i];
    Eigen::Vector3d prev;
    bool haveprev = false;
    for (int sp = 0; sp < piece_num; sp++) {
      Data bz = convert_list[sp] *
                spline.block<order_num + 1, 3>(sp * (order_num - 2), 0);
      for (double t = 0.0; t < 1.0; t += 0.05 / pt) {
        Eigen::Vector3d pos = Eigen::Vector3d::Zero();
        for (int j = 0; j <= order_num; j++)
          pos += combination[order_num][j] * std::pow(t, j) *
                 std::pow(1 - t, order_num - j) * bz.row(j).transpose();
        samples[i].push_back(pos);
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
  for (int i = 0; i < uav_num; i++)
    for (int j = i + 1; j < uav_num; j++)
      for (const auto &a : samples[i])
        for (const auto &b : samples[j]) {
          double d = (a - b).norm();
          if (d < min_pair) min_pair = d;
        }

  std::cout << "RESULT mesh=" << mesh << " mode="
            << (decouple ? "decoupled" : "coupled") << " iters=" << iter
            << " wall_ms=" << ms << " iters_per_s=" << iter / (ms / 1e3)
            << " gnorm=" << gnorm << " piece_time="
            << (decouple ? piece_time_list[0] : piece_time)
            << " ccd_time=" << time_total << " ccd_len=" << len_total
            << " min_clearance=" << min_clear
            << " min_pair_dist=" << min_pair << "\n";
  return iter < max_iters ? 0 : 2;
}
