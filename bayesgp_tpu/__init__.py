"""bayesgp_tpu — TPU-native Bayesian hierarchical GP regression.

A ground-up JAX/XLA/Pallas rebuild of the capabilities of the BayesGP R
package (reference mounted at /root/reference): Gaussian-process smooths
(IWP / sGP / IID / Customized priors) in hierarchical models for
Gaussian, Poisson, Binomial, Cox partial-likelihood and case-crossover
responses, fitted with a Laplace approximation over the latent field and
adaptive Gauss-Hermite quadrature (or MAP / NUTS) over hyperparameters.
"""

from .api import model_fit
from .api_loop import model_fit_loop
from .formula import parse_formula, parse_f_call, f
from .terms import (build_iwp_term, build_sgp_term, build_iid_term,
                    build_customized_term, normalize_sd_prior)
from .postfit import (FitResult, compute_post_fun_iwp, compute_post_fun_sgp,
                      extract_mean_interval_given_samps)
from .basis.priors import (prior_conversion_iwp, prior_conversion_sgp,
                           compute_d_step_sgp_sd)
from .basis.osplines import (local_poly_helper, global_poly_helper,
                             compute_weights_precision)
from .basis.sgp import (compute_B_sB, compute_B_sB_helper, compute_Q_sB,
                        global_poly_sgp)
from .model.families import register_family
from .inference.mcmc import default_option_list as get_default_option_list_MCMC
from .serialize import save_fit, load_fit
from . import datasets

__version__ = "0.1.0"

# ---- reference-cased aliases (BayesGP NAMESPACE:3-23 names) ----------
# The reference exports these with IWP/sGP casing; keep both spellings so
# code written against the R package ports by search-and-replace only.
compute_post_fun_IWP = compute_post_fun_iwp
compute_post_fun_sGP = compute_post_fun_sgp
prior_conversion_IWP = prior_conversion_iwp
prior_conversion_sGP = prior_conversion_sgp
global_poly_helper_sGP = global_poly_sgp
compute_d_step_sGPsd = compute_d_step_sgp_sd


# ---- reference function-style post-fit API ---------------------------
# The reference exports these as plain functions taking the fit object
# (NAMESPACE: var_density, para_density, post_table, sample_fixed_effect);
# here they are FitResult methods — these wrappers keep the functional
# spelling working.
def var_density(fit, *args, **kwargs):
    """Posterior/prior density of an SD parameter (R/03_post_fit.R:301-443).
    Function spelling of FitResult.var_density."""
    return fit.var_density(*args, **kwargs)


def para_density(fit, *args, **kwargs):
    """Densities of all parameters (R/03_post_fit.R:446-467).
    Function spelling of FitResult.para_density."""
    return fit.para_density(*args, **kwargs)


def post_table(fit, *args, **kwargs):
    """Posterior summary table (R/03_post_fit.R:474-531).
    Function spelling of FitResult.post_table."""
    return fit.post_table(*args, **kwargs)


def sample_fixed_effect(fit, variables):
    """Fixed-effect sample rows (R/03_post_fit.R:159-165).
    Function spelling of FitResult.sample_fixed_effect."""
    return fit.sample_fixed_effect(variables)


def predict(fit, *args, **kwargs):
    """Posterior prediction (R generic predict.FitResult,
    R/03_post_fit.R:44-125). Function spelling of FitResult.predict."""
    return fit.predict(*args, **kwargs)


def plot(fit, *args, **kwargs):
    """Per-RE posterior plot (R generic plot.FitResult,
    R/03_post_fit.R:127-151). Function spelling of FitResult.plot."""
    return fit.plot(*args, **kwargs)


def summary(fit):
    """Fit summary (R generic summary.FitResult, R/03_post_fit.R:1-42).
    Function spelling of FitResult.summary."""
    return fit.summary()


__all__ = [
    "model_fit", "model_fit_loop", "parse_formula", "parse_f_call",
    "build_iwp_term", "build_sgp_term", "build_iid_term",
    "build_customized_term", "normalize_sd_prior", "FitResult",
    "compute_post_fun_iwp", "compute_post_fun_sgp",
    "extract_mean_interval_given_samps", "prior_conversion_iwp",
    "prior_conversion_sgp", "compute_d_step_sgp_sd", "local_poly_helper",
    "global_poly_helper", "compute_weights_precision", "compute_B_sB",
    "compute_B_sB_helper", "compute_Q_sB", "global_poly_sgp", "datasets",
    "register_family", "get_default_option_list_MCMC", "save_fit",
    "load_fit",
    # reference-cased aliases + function-style post-fit API
    "compute_post_fun_IWP", "compute_post_fun_sGP", "prior_conversion_IWP",
    "prior_conversion_sGP", "global_poly_helper_sGP", "compute_d_step_sGPsd",
    "var_density", "para_density", "post_table", "sample_fixed_effect",
    "f", "predict", "plot", "summary",
]
