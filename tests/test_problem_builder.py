"""qpcpp-style incremental Problem builder (migration surface).

Oracles mirror the reference's qpcpp tests: ProblemTest.cpp bookkeeping
and CPLEXTest.cpp:28-50 (min x^2+y^2 s.t. x+y >= 1 -> (0.5, 0.5)).
"""
import numpy as np

from mpc_cbf_tpu.ops.qp.problem import Problem, SolveStatus


def test_problem_bookkeeping():
    p = Problem()
    x = p.add_variable(-1.0, 1.0)
    y = p.add_variable()
    assert p.num_variables() == 2
    c = p.add_linear_constraint(1.0, 1e20)
    c.set_coefficient(x, 1.0)
    c.set_coefficient(y, 1.0)
    assert c.get_coefficient(x) == 1.0
    assert p.num_linear_constraints() == 1
    cost = p.cost_function()
    cost.add_quadratic_term(x, x, 1.0)
    cost.add_quadratic_term(x, y, 0.5)
    assert cost.get_quadratic_coefficient(y, x) == 0.5  # symmetric key
    p.reset_problem()
    assert p.num_linear_constraints() == 0
    assert p.num_variables() == 2  # variables survive reset


def test_cplex_test_case():
    """min x^2 + y^2 s.t. x + y >= 1 (CPLEXTest.cpp:28-50)."""
    p = Problem()
    x = p.add_variable()
    y = p.add_variable()
    c = p.add_linear_constraint(1.0, 1e20)
    c.set_coefficient(x, 1.0)
    c.set_coefficient(y, 1.0)
    cost = p.cost_function()
    cost.add_quadratic_term(x, x, 1.0)
    cost.add_quadratic_term(y, y, 1.0)
    status = p.solve()
    assert status == SolveStatus.OPTIMAL
    np.testing.assert_allclose([x.solution_value, y.solution_value],
                               [0.5, 0.5], atol=1e-5)


def test_variable_bounds_and_linear_cost():
    """min (x-2)^2 with x <= 1 -> x = 1."""
    p = Problem()
    x = p.add_variable(-10.0, 1.0)
    cost = p.cost_function()
    cost.add_quadratic_term(x, x, 1.0)
    cost.add_linear_term(x, -4.0)
    cost.add_constant(4.0)
    status = p.solve()
    assert status == SolveStatus.OPTIMAL
    np.testing.assert_allclose(x.solution_value, 1.0, atol=1e-5)


def test_infeasible_reported():
    p = Problem()
    x = p.add_variable(0.0, 1.0)
    c = p.add_linear_constraint(5.0, 1e20)  # x >= 5 vs x <= 1
    c.set_coefficient(x, 1.0)
    cost = p.cost_function()
    cost.add_quadratic_term(x, x, 1.0)
    assert p.solve() in (SolveStatus.INFEASIBLE, SolveStatus.UNKNOWN)
